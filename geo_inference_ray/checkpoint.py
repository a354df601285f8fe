"""Checkpointed, resumable partitioned runs with per-partition lineage.

North rule: "every partition emits lineage records and checkpoints so a
killed job resumes without recomputing completed cells."  The reference
has nothing here (crash => full rerun, SURVEY §4); this module is the
designed replacement:

* output layout: ``<out_root>/<stage>/key=<key>/part-*.parquet`` — one
  directory per partition key, written to a temp dir and atomically
  renamed, so a partition is either absent or complete;
* ``manifest.jsonl``: one lineage record per completed partition
  ``{stage, key, input_fingerprint, rows_out, bytes_out, wall_ms,
  attempt, finished_at}`` — appended after the rename;
* resume: completed keys are read from the manifest AND validated
  against the directory (both must agree); pending keys are recomputed.
  If the input fingerprint of a completed key changed, it is
  invalidated and recomputed.

The unit of partitioning is the caller's key (hex-cell prefix, shard id,
tile range...).  Keys must deterministically map to their input slice —
resume correctness follows from outputs being pure functions of keys.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class PartitionedRun:
    def __init__(self, out_root: str, stage: str):
        self.stage_dir = os.path.join(out_root, stage)
        self.stage = stage
        os.makedirs(self.stage_dir, exist_ok=True)
        self.manifest_path = os.path.join(self.stage_dir, "manifest.jsonl")

    # -- lineage -----------------------------------------------------------
    def records(self) -> list[dict]:
        if not os.path.exists(self.manifest_path):
            return []
        out = []
        with open(self.manifest_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    def completed(self, fingerprints: dict[str, str] | None = None) -> set[str]:
        """Keys whose manifest record exists, whose directory exists, and
        whose recorded fingerprint matches the expected one (if given)."""
        done = set()
        for rec in self.records():
            key = rec["key"]
            kdir = os.path.join(self.stage_dir, f"key={key}")
            if not os.path.isdir(kdir):
                continue
            if fingerprints is not None and \
                    rec.get("input_fingerprint") != fingerprints.get(key):
                continue
            done.add(key)
        return done

    def _append(self, rec: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")

    # -- execution ---------------------------------------------------------
    def run(self, keys: list[str], make_ds, fingerprints: dict[str, str]
            | None = None, attempt: int = 1) -> dict:
        """Process every pending key: ``make_ds(key)`` -> Dataset, write
        its parquet partition atomically, append the lineage record.

        Returns {"computed": [...], "skipped": [...]}.
        """
        fingerprints = fingerprints or {}
        done = self.completed(fingerprints if fingerprints else None)
        computed, skipped = [], []
        for key in keys:
            if key in done:
                skipped.append(key)
                continue
            t0 = time.time()
            ds = make_ds(key)
            kdir = os.path.join(self.stage_dir, f"key={key}")
            tmp = kdir + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            if os.path.exists(kdir):
                shutil.rmtree(kdir)  # stale partial without manifest record
            os.makedirs(tmp)  # empty partitions still get a directory
            ds.write_parquet(tmp)
            rows, nbytes = _parquet_stats(tmp)
            os.rename(tmp, kdir)
            self._append({
                "stage": self.stage, "key": key,
                "input_fingerprint": fingerprints.get(key),
                "rows_out": rows, "bytes_out": nbytes,
                "wall_ms": int((time.time() - t0) * 1000),
                "attempt": attempt,
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            })
            computed.append(key)
        return {"computed": computed, "skipped": skipped}

    def run_single_pass(self, keys: list[str], ds, key_fn,
                        fingerprints: dict[str, str] | None = None,
                        attempt: int = 1) -> dict:
        """Write every pending partition in ONE dataset execution.

        ``key_fn(batch) -> pa.Table`` appends a string ``part_key``
        column; the write uses Ray's hive-partitioned parquet sink
        (``partition_cols``), then each completed subdirectory is
        atomically renamed into the ``key=<key>`` layout with its
        lineage record.  Replaces the one-filter-pass-per-key pattern
        (10 keys meant 10 full input scans); rows not belonging to any
        pending key are filtered out before the write, so resume skips
        finished partitions without recomputing them.
        """
        import pyarrow as pa

        fingerprints = fingerprints or {}
        # hive-layout safety: key strings become directory names
        # (key=<key>); characters needing URL-encoding would make the
        # written dir diverge from the os.path lookup and silently
        # produce empty partitions — reject them up front
        import re

        bad = [k for k in keys
               if not re.fullmatch(r"[A-Za-z0-9._-]+", k)]
        if bad:
            raise ValueError(
                f"run_single_pass: partition keys must match "
                f"[A-Za-z0-9._-]+ (hive-dir safe); got {bad[:5]}")
        done = self.completed(fingerprints if fingerprints else None)
        pending = [k for k in keys if k not in done]
        skipped = [k for k in keys if k in done]
        if not pending:
            return {"computed": [], "skipped": skipped}
        t0 = time.time()
        pend_set = set(pending)
        known = set(keys)

        def keyed(batch):
            out = key_fn(batch)
            pk = out["part_key"].to_pylist()
            novel = [k for k in pk if k not in known]
            if novel:
                # a key outside `keys` would be silently dropped —
                # that's data loss, not resume-skipping; fail loudly
                raise ValueError(
                    f"run_single_pass: key_fn produced partition keys "
                    f"outside the declared key list: "
                    f"{sorted(set(novel))[:5]}")
            keep = [k in pend_set for k in pk]
            return out.filter(pa.array(keep))

        tmp_root = os.path.join(self.stage_dir, "_singlepass.tmp")
        if os.path.exists(tmp_root):
            shutil.rmtree(tmp_root)
        os.makedirs(tmp_root)
        ds.map_batches(keyed, batch_format="pyarrow",
                       zero_copy_batch=True) \
          .write_parquet(tmp_root, partition_cols=["part_key"])
        wall_ms = int((time.time() - t0) * 1000)
        computed = []
        for key in pending:
            src = os.path.join(tmp_root, f"part_key={key}")
            kdir = os.path.join(self.stage_dir, f"key={key}")
            if os.path.exists(kdir):
                shutil.rmtree(kdir)  # stale partial without manifest record
            if os.path.isdir(src):
                os.rename(src, kdir)
            else:
                os.makedirs(kdir)  # empty partitions still get a directory
            rows, nbytes = _parquet_stats(kdir)
            self._append({
                "stage": self.stage, "key": key,
                "input_fingerprint": fingerprints.get(key),
                "rows_out": rows, "bytes_out": nbytes,
                "wall_ms": wall_ms, "attempt": attempt,
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            })
            computed.append(key)
        shutil.rmtree(tmp_root, ignore_errors=True)
        return {"computed": computed, "skipped": skipped}

    def read(self, keys: list[str] | None = None):
        """Dataset over completed partitions (all, or the given keys)."""
        import ray.data as rd

        done = sorted(self.completed()) if keys is None else keys
        paths = []
        for k in done:
            kdir = os.path.join(self.stage_dir, f"key={k}")
            paths.extend(os.path.join(kdir, f)
                         for f in sorted(os.listdir(kdir))
                         if f.endswith(".parquet"))
        return rd.read_parquet(paths)


def _parquet_stats(d: str) -> tuple[int, int]:
    import pyarrow.parquet as pq

    rows = nbytes = 0
    for root, _, files in os.walk(d):
        for fn in files:
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                rows += pq.ParquetFile(p).metadata.num_rows
                nbytes += os.path.getsize(p)
    return rows, nbytes


# ---------------------------------------------------------------------------
# Zone maps: footer-stats manifest + file-pruned reads
# ---------------------------------------------------------------------------
#
# "Prune at the read" infrastructure: per-file min/max of chosen columns
# (from parquet FOOTER statistics only — no data pages are touched) are
# written once to zonemap.json next to the files; a range query then
# opens only the files whose zone intersects the predicate.  On a
# Z-order / Hilbert-sorted layout (relational.zorder, geoext.hilbert)
# this turns a spatial range scan from O(all files) into O(overlapping
# files) — the single biggest read-side lever at 100 TB.

ZONEMAP_NAME = "zonemap.json"


def build_zonemap(root: str, columns: list[str]) -> dict:
    """Scan parquet footers under ``root`` and write ``zonemap.json``
    mapping each file (relative path) to {column: [min, max]} over its
    row groups.  Returns the map.  Columns missing statistics raise —
    a silent None would disable pruning for that file and read as
    "covered" when it wasn't."""
    import pyarrow.parquet as pq

    zmap: dict[str, dict] = {}
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, fn)
            md = pq.ParquetFile(p).metadata
            names = {md.schema.column(i).name: i
                     for i in range(md.num_columns)}
            ent: dict[str, list] = {}
            for col in columns:
                if col not in names:
                    raise ValueError(f"zonemap: column {col!r} not in "
                                     f"{p} (has {sorted(names)})")
                lo = hi = None
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(names[col]).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"zonemap: no min/max stats for {col!r} in "
                            f"{p} row group {g}")
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                ent[col] = [lo, hi]
            zmap[os.path.relpath(p, root)] = ent
    with open(os.path.join(root, ZONEMAP_NAME), "w") as f:
        json.dump(zmap, f, sort_keys=True)
    return zmap


def read_pruned(root: str, column: str, lo, hi,
                columns: list[str] | None = None):
    """Range-pruned Dataset over a zonemapped directory: only files
    whose [min, max] zone for ``column`` intersects [lo, hi] are
    opened; the exact row filter still runs on the survivors (zones
    are a superset screen).  Returns (dataset, n_files_total,
    n_files_read)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    zpath = os.path.join(root, ZONEMAP_NAME)
    with open(zpath) as f:
        zmap = json.load(f)
    keep = [os.path.join(root, rel) for rel, ent in sorted(zmap.items())
            if ent[column][0] <= hi and ent[column][1] >= lo]
    if not keep:
        # empty selection: an explicit empty table carrying the footer
        # schema (a fully-filtered read loses its columns downstream)
        import pyarrow as pa
        import pyarrow.parquet as pq

        sch = pq.read_schema(
            os.path.join(root, next(iter(sorted(zmap)))))
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
        return rd.from_arrow(sch.empty_table()), len(zmap), 0
    expr = (pads.field(column) >= lo) & (pads.field(column) <= hi)
    ds = rd.read_parquet(keep, columns=columns, filter=expr)
    return ds, len(zmap), len(keep)


def zonemap_range_query(sf_dir: str, lat_lo: float, lat_hi: float):
    """End-to-end zone-map demo with an exact-SQL contract: the
    geocoded pages are written ONCE (cached under /tmp per sf) into
    latitude-banded parquet partitions, a footer-stats zonemap is
    built, and the range read opens only the intersecting band files —
    yet must return exactly the rows a full-scan SQL filter returns
    (pruning is a superset screen; the exact predicate still runs).

    Returns a Dataset of (doc_id, lat, lon) with lat in
    [lat_lo, lat_hi]."""
    import numpy as np
    import pyarrow as pa

    from .stages import geo_pipeline

    base = os.path.basename(sf_dir.rstrip("/"))
    root = f"/tmp/graft_zonemap/{base}"
    marker = os.path.join(root, "_SUCCESS")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)

        def band(batch: pa.Table) -> pa.Table:
            lat = batch["lat"].to_numpy(zero_copy_only=False)
            b = np.clip(((lat + 90.0) // 15.0).astype(np.int64), 0, 11)
            return pa.table({
                "doc_id": batch["doc_id"], "lat": batch["lat"],
                "lon": batch["lon"],
                "band": pa.array([f"{x:02d}" for x in b.tolist()])})

        geo_pipeline(sf_dir, with_cells=False) \
            .select_columns(["doc_id", "lat", "lon"]) \
            .map_batches(band, batch_format="pyarrow",
                         zero_copy_batch=True) \
            .write_parquet(root, partition_cols=["band"])
        build_zonemap(root, ["lat"])
        with open(marker, "w") as f:
            f.write("ok")

    ds, _, _ = read_pruned(root, "lat", lat_lo, lat_hi,
                           columns=["doc_id", "lat", "lon"])
    return ds
