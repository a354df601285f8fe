"""Auxiliary sources: the work-manifest reader and multi-source union —
analogs of the reference's CSV manifest / STAC band assembly.

Reference parity:
* S4 manifest reader (/root/reference/geo_inference/utils/helpers.py:
  366-413): parse {tif, gpkg, split, aoi_id} rows, pad missing columns,
  absolute-path the files, SORT BY split.  No manifest ships with the
  test data, so rows are synthesized deterministically from the ``part``
  table (SQL-mirrorable), then the same validate/pad/sort pipeline runs.
* S3 STAC per-band assembly (helpers.py:335-363): modeled as a union of
  per-source datasets selected by name — ``union_sources``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SPLITS = ("trn", "tst", "val")  # sorted order (reference sorts by split)


def synth_manifest_batch(batch: pa.Table) -> pa.Table:
    """part rows -> manifest rows {tif, gpkg, split, aoi_id}.

    split = p_partkey % 3 indexed into SPLITS; deterministic and
    expressible in the SQL oracle."""
    key = batch["p_partkey"]
    sid = pc.cast(key, pa.string())
    tif = pc.binary_join_element_wise(
        pa.scalar("/data/aoi_"), sid, pa.scalar(".tif"), pa.scalar(""))
    gpkg = pc.binary_join_element_wise(
        pa.scalar("/data/aoi_"), sid, pa.scalar(".gpkg"), pa.scalar(""))
    rem = pc.cast(pc.subtract(key, pc.multiply(pc.divide(key, 3), 3)),
                  pa.int64())
    split = pc.case_when(
        pc.make_struct(pc.equal(rem, 0), pc.equal(rem, 1)),
        pa.scalar(SPLITS[0]), pa.scalar(SPLITS[1]), pa.scalar(SPLITS[2]))
    return pa.table({
        "tif": tif, "gpkg": gpkg, "split": split,
        "aoi_id": pc.cast(key, pa.int64()),
    })


def manifest(sf_dir: str):
    """Deterministic manifest Dataset, sorted by split (S4 semantics)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    ds = ds.map_batches(synth_manifest_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    return ds.sort("split")


def union_sources(sf_dirs: list[str], table: str = "documents",
                  columns: list[str] | None = None):
    """Union of per-source datasets (S3/STAC analog: assemble one logical
    dataset from per-band/per-source files selected by name)."""
    import ray.data as rd

    parts = [rd.read_parquet(f"{d}/{table}.parquet", columns=columns)
             for d in sf_dirs]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
