#!/usr/bin/env python
"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1), one JSON line on stdout.

Headline metric (BASELINE.json): joined rows/sec + tiles/sec on the
Common-Crawl-style spatial join.  The sandbox tables are small, so the
bench expands the input deterministically — EXPAND shard copies of the
documents table with disjoint doc_id ranges (doc_id + shard * 10**7),
each shard a separate read task — before running the *same* pipeline
(synthesize pages -> extract text -> geocode -> hex/S2 cells -> broadcast
STRtree PIP join -> count).  Expansion is pure input scaling; every row
still flows through every stage.

``--scaling``: run the bench twice in fresh processes at num_cpus=8 and
num_cpus=32 on the same input and report throughputs + scaling
efficiency = (t_8 / t_32) / (32 / 8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("GRAFT_BENCH_EXPAND", "256"))
SHARD_OFFSET = 10 ** 7


def ensure_shards(sf_dir: str, expand: int) -> str:
    """Materialize ``expand`` deterministic shard copies of documents
    .parquet (doc_id offset per shard) under /tmp once — untimed setup,
    shared by every bench run and both scaling levels.  The measured
    pipeline then starts from a real multi-file parquet dataset with one
    read task per file (the natural Ray Data parallelism)."""
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
    idx = t.schema.get_field_index("doc_id")
    for shard in range(expand):
        s = t.set_column(idx, "doc_id",
                         pc.add(t["doc_id"], shard * SHARD_OFFSET))
        pq.write_table(s, os.path.join(out, f"part-{shard:05d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def expanded_pages(sf_dir: str, expand: int):
    """Pages Dataset over the expanded shard files: read_parquet (one
    task per file) -> vectorized pages synthesis."""
    import ray.data as rd

    from geo_inference_ray import synth

    shard_dir = ensure_shards(sf_dir, expand)
    ds = rd.read_parquet(shard_dir,
                         columns=["doc_id", "text", "lang", "source"])
    return ds.map_batches(synth.synth_pages_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from geo_inference_ray import stages, tiling
    from geo_inference_ray.knn import cell_aggregate, knn_in_cells

    # untimed setup: shard materialization + OS page cache warm
    ensure_shards(SF_DIR, EXPAND)
    with open(f"{SF_DIR}/documents.parquet", "rb") as f:
        f.read()

    queries: dict[str, float] = {}
    counters: dict[str, float] = {}

    pool = max(1, NUM_CPUS // 3 - 1)

    # Q1 headline: expanded pages -> full spatial join, count rows
    t0 = time.time()
    ds = expanded_pages(SF_DIR, EXPAND)
    joined = stages.transform_pages(ds, mode="inner", max_actors=pool,
                                    fixed_pools=True)
    n_joined = joined.count()
    dt = time.time() - t0
    queries["spatial_join"] = round(dt, 3)
    n_pages = None  # rows processed = docs * EXPAND
    import pyarrow.parquet as pq
    n_docs = pq.ParquetFile(f"{SF_DIR}/documents.parquet").metadata.num_rows
    n_pages = n_docs * EXPAND
    counters["joined_rows"] = n_joined
    counters["input_rows"] = n_pages
    counters["joined_rows_per_sec"] = round(n_joined / dt, 1)
    counters["input_rows_per_sec"] = round(n_pages / dt, 1)

    # Q2: tile pipeline on the expanded pages -> mask tiles
    t0 = time.time()
    geo = stages.transform_pages(expanded_pages(SF_DIR, EXPAND),
                                 with_cells=False, max_actors=pool,
                                 fixed_pools=True)
    tiles = tiling.mask_tiles(geo, tiling.DEFAULT_GRID)
    n_tiles = tiles.count()
    dt = time.time() - t0
    queries["tile_merge"] = round(dt, 3)
    counters["tiles"] = n_tiles
    counters["tiles_per_sec"] = round(n_tiles / dt, 1)

    # Q3: cell-local kNN on expanded pages
    t0 = time.time()
    geo = stages.transform_pages(expanded_pages(SF_DIR, EXPAND),
                                 max_actors=pool, fixed_pools=True)
    n_knn = knn_in_cells(geo).count()
    queries["knn_cell"] = round(time.time() - t0, 3)
    counters["knn_rows"] = n_knn

    # Q4: per-cell aggregate (map-side partials + groupby)
    t0 = time.time()
    geo = stages.transform_pages(expanded_pages(SF_DIR, EXPAND),
                                 max_actors=pool, fixed_pools=True)
    n_cells = cell_aggregate(geo).count()
    queries["cell_agg"] = round(time.time() - t0, 3)
    counters["cells"] = n_cells

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "joined rows/sec + tiles/sec, Common-Crawl-style "
                  "Parquet spatial join (deterministic synthetic pages)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rsplit("sf", 1)[-1],
        "num_cpus": NUM_CPUS,
        "expand": EXPAND,
        "counters": counters,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (32 / 8)
    return {
        "sec_8": t_lo, "sec_32": t_hi,
        "queries_8": lo["queries"], "queries_32": hi["queries"],
        "joined_rows_per_sec_8": lo["counters"]["joined_rows_per_sec"],
        "joined_rows_per_sec_32": hi["counters"]["joined_rows_per_sec"],
        "tiles_per_sec_8": lo["counters"]["tiles_per_sec"],
        "tiles_per_sec_32": hi["counters"]["tiles_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
