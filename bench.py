#!/usr/bin/env python
"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1), one JSON line on stdout.

Headline metric (BASELINE.json): joined rows/sec + tiles/sec on the
Common-Crawl-style spatial join.  The sandbox tables are small, so the
bench expands the input deterministically — shard copies of the
documents table with disjoint doc_id ranges (doc_id + shard * 10**7)
materialized once as real parquet files (untimed setup) — then runs the
same pipeline on every row: synthesize pages -> extract text -> geocode
-> hex/S2 cells -> broadcast STRtree PIP join.

Physical plan notes (measured on this box, see BENCH/BASELINE.md):
* the four per-row stages are fused into one stateless map_batches fn so
  Ray fuses them INTO the read tasks — page bytes never cross the object
  store (the actor-pool form moved ~7 GB through plasma and anti-scaled);
* EXPAND_MAIN sizes the headline join/tiles input so compute dominates
  the ~2 s fixed executor overhead; kNN/cell-agg run at EXPAND_AUX
  (their group-local compute is heavier per row);
* one untimed warm-up execution spawns the worker pool and warms the
  page cache before any timing.

``--scaling``: run the bench at num_cpus=2, 8 and 32 in fresh processes
on the same input; scaling efficiency is computed on the headline
(join + tiles) time for both N->4N pairs: eff = (t_N / t_4N) / 4.
See run_scaling's docstring and BENCH/BASELINE.md for why the 2->8 pair
is the faithful multi-node proxy on a single shared-bandwidth box.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND_MAIN = int(os.environ.get("GRAFT_BENCH_EXPAND", "2048"))
EXPAND_AUX = int(os.environ.get("GRAFT_BENCH_EXPAND_AUX", "64"))
# dedup stress corpus: every doc 16x-duplicated -> every LSH bucket hot
# (worst case for the pair stage).  Skipped in the scaling legs
# (GRAFT_BENCH_DEDUP=0) — the scaling metric is the headline pair.
EXPAND_DEDUP = int(os.environ.get("GRAFT_BENCH_EXPAND_DEDUP", "16"))
SHARD_OFFSET = 10 ** 7


def ensure_shards(sf_dir: str, expand: int) -> str:
    """Materialize ``expand`` deterministic shard copies of
    documents.parquet (doc_id offset per shard) under /tmp once — untimed
    setup shared by every run and both scaling levels."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    base = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/graft_bench/{base}_x{expand}"
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "lang", "source"])
    t = t.replace_schema_metadata(None)  # pandas metadata defeats Ray's
    # schema dedup (unhashable dict) and spams warnings
    idx = t.schema.get_field_index("doc_id")
    for shard in range(expand):
        s = t.set_column(idx, "doc_id",
                         pc.add(t["doc_id"], shard * SHARD_OFFSET))
        pq.write_table(s, os.path.join(out, f"part-{shard:05d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def expanded_pages(sf_dir: str, expand: int):
    """Pages Dataset over the expanded shard files: read_parquet (file-
    parallel) -> vectorized pages synthesis (fuses into the read)."""
    import ray.data as rd

    from geo_inference_ray import synth

    shard_dir = ensure_shards(sf_dir, expand)
    ds = rd.read_parquet(shard_dir,
                         columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(synth.synth_pages_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _join_ds(expand: int):
    from geo_inference_ray import stages

    # batch_size=None = one zero-copy batch per block: ~10% faster
    # than 8192 in isolated min-of-2 sweeps (no slicing / re-chunk
    # overhead), within noise in the full bench; the memory envelope
    # is a block (~128 MB at scale) x the fused fn's working set,
    # fine for stateless task parallelism.  knn/tiles keep 8192 —
    # the salted emit there prefers smaller batches (measured).
    return expanded_pages(SF_DIR, expand).map_batches(
        stages.fused_page_fn("inner", True), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)


def _geo_ds(expand: int, with_cells: bool = True,
            keep: list | None = None):
    from geo_inference_ray import stages

    return expanded_pages(SF_DIR, expand).map_batches(
        stages.fused_page_fn(None, with_cells, keep=keep),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=8192)


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # Ray 2.49's per-operator resource reservation throttles a map
    # operator feeding an AllToAll to ~1 concurrent task on this
    # single-node setup (measured 2.3x slowdown on the rasterize
    # groupby); the store is generously sized, so disable it.
    ctx.op_resource_reservation_enabled = False

    from geo_inference_ray import tiling
    from geo_inference_ray.knn import cell_aggregate, knn_in_cells

    # untimed setup: shard materialization, worker-pool spawn, page cache
    ensure_shards(SF_DIR, EXPAND_MAIN)
    ensure_shards(SF_DIR, EXPAND_AUX)
    _join_ds(EXPAND_MAIN).count()  # warm-up execution

    import pyarrow.parquet as pq
    n_docs = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows

    queries: dict[str, float] = {}
    counters: dict[str, float] = {}
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))

    def timed(name: str, fn) -> int:
        """min-of-reps wall time: this box is a shared VM with noisy
        neighbors (load spikes with zero local processes), so a single
        sample can be 2x off."""
        best, out = None, None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)
        return out

    # Q1 headline: full spatial join
    n_joined = timed("spatial_join", lambda: _join_ds(EXPAND_MAIN).count())
    counters["joined_rows"] = n_joined
    counters["input_rows"] = n_docs * EXPAND_MAIN
    counters["joined_rows_per_sec"] = round(
        n_joined / queries["spatial_join"], 1)
    counters["input_rows_per_sec"] = round(
        n_docs * EXPAND_MAIN / queries["spatial_join"], 1)

    # Q2 headline: tile pipeline -> mask tiles
    n_tiles = timed("tile_merge", lambda: tiling.mask_tiles(
        _geo_ds(EXPAND_MAIN, with_cells=False, keep=["lat", "lon"]),
        tiling.DEFAULT_GRID).count())
    counters["tiles"] = n_tiles
    counters["tiles_per_sec"] = round(n_tiles / queries["tile_merge"], 1)

    # Q3 aux: cell-local kNN (salted, grid-pruned)
    n_knn = timed("knn_cell", lambda: knn_in_cells(
        _geo_ds(EXPAND_AUX, keep=["doc_id", "lat", "lon", "hex7"])).count())
    counters["knn_rows"] = n_knn

    # Q4 aux: per-cell aggregate (map-side partials + groupby)
    n_cells = timed("cell_agg", lambda: cell_aggregate(
        _geo_ds(EXPAND_AUX, keep=["hex7", "lat", "lon"])).count())
    counters["cells"] = n_cells

    # Q5/Q6 aux: high-cardinality grouped kernels (hash-partitioned,
    # one vectorized kernel per partition — regression guard for the
    # per-group-Python trap)
    from geo_inference_ray import relational

    counters["sessions"] = timed(
        "sessionize", lambda: relational.sessionize(SF_DIR).count())
    counters["topk_rows"] = timed(
        "top_orders",
        lambda: relational.top_orders_per_customer(SF_DIR).count())

    # Q7: MinHash-LSH near-dup candidates over the 16x-duplicated
    # corpus (every band bucket hot — the pair-stage worst case)
    if os.environ.get("GRAFT_BENCH_DEDUP", "1") != "0":
        import ray.data as rd

        from geo_inference_ray import dedup as _dedup

        shard_dedup = ensure_shards(SF_DIR, EXPAND_DEDUP)

        def run_dedup():
            ds = rd.read_parquet(shard_dedup,
                                 columns=["doc_id", "text"])
            return _dedup.minhash_candidates(ds).count()

        counters["dedup_pairs"] = timed("minhash_dedup", run_dedup)
        counters["dedup_docs"] = n_docs * EXPAND_DEDUP

    # Q8: many-component polygonize (VERDICT r2 item 7 done-criterion).
    # Synthetic dot-pattern mask: every even (y, x) pixel is a 1-pixel
    # component -> 16 isolated components per 8x8 tile, 128x128 tiles =
    # 262144 components.  This is the sliver-heavy fine-grid shape that
    # made the old one-pandas-call-per-component map_groups tracer
    # pathological; the hash-partitioned tracer does one call per
    # partition.
    if os.environ.get("GRAFT_BENCH_POLY", "1") != "0":
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from geo_inference_ray.polygonize import polygons_distributed
        from geo_inference_ray.tiling import GridConfig

        pgrid = GridConfig(width=1024, height=1024)
        s = pgrid.stride
        tiles_x = pgrid.width // s

        def dot_tiles(batch):
            idx = batch["id"].to_numpy()
            m = np.zeros((s, s), dtype=np.uint8)
            m[::2, ::2] = 1
            flat = m.reshape(-1)
            return pa.table({
                "oy": pa.array(idx // tiles_x),
                "ox": pa.array(idx % tiles_x),
                "mask": pa.array([flat] * len(idx),
                                 pa.list_(pa.uint8())),
            })

        n_tiles_poly = (pgrid.width // s) * (pgrid.height // s)

        def run_poly():
            tiles = rd.range(n_tiles_poly, override_num_blocks=64) \
                      .map_batches(dot_tiles, batch_format="pyarrow")
            return polygons_distributed(tiles, pgrid).count()

        counters["poly_rings"] = timed("polygonize_multi", run_poly)
        counters["poly_components"] = n_tiles_poly * (s // 2) ** 2

    headline = round(queries["spatial_join"] + queries["tile_merge"], 3)
    result = {
        "metric": "joined rows/sec + tiles/sec, Common-Crawl-style "
                  "Parquet spatial join (deterministic synthetic pages)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "headline_sec": headline,
        "sf": SF_DIR.rsplit("sf", 1)[-1],
        "num_cpus": NUM_CPUS,
        "expand_main": EXPAND_MAIN,
        "expand_aux": EXPAND_AUX,
        "counters": counters,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job at three parallelism levels in fresh processes; report
    both N->4N pairs (2->8 and 8->32).

    On this single-node sandbox all "nodes" share one memory-bandwidth
    and object-store budget, which a real 4N-node cluster multiplies;
    the low-CPU pair is therefore the better proxy for multi-node
    scaling, and the 8->32 pair is reported alongside as the
    worst-case same-box number."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_DEDUP="0", GRAFT_BENCH_POLY="0")
        # the 2-CPU leg is slow; min-of-2 keeps the scaling run's wall
        # time bounded while the main bench defaults to min-of-3
        env.setdefault("GRAFT_BENCH_REPS", "2")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    r2, r8, r32 = run(2), run(8), run(32)
    eff_2_8 = (r2["headline_sec"] / r8["headline_sec"]) / 4.0
    eff_8_32 = (r8["headline_sec"] / r32["headline_sec"]) / 4.0
    return {
        "headline_sec_2": r2["headline_sec"],
        "headline_sec_8": r8["headline_sec"],
        "headline_sec_32": r32["headline_sec"],
        "total_sec": {"2": r2["value"], "8": r8["value"],
                      "32": r32["value"]},
        "queries_2": r2["queries"], "queries_8": r8["queries"],
        "queries_32": r32["queries"],
        "joined_rows_per_sec": {
            "2": r2["counters"]["joined_rows_per_sec"],
            "8": r8["counters"]["joined_rows_per_sec"],
            "32": r32["counters"]["joined_rows_per_sec"]},
        "tiles_per_sec": {
            "2": r2["counters"]["tiles_per_sec"],
            "8": r8["counters"]["tiles_per_sec"],
            "32": r32["counters"]["tiles_per_sec"]},
        "scaling_efficiency_2_8": round(eff_2_8, 3),
        "scaling_efficiency_8_32": round(eff_8_32, 3),
        "scaling_efficiency": round(eff_2_8, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
