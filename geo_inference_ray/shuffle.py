"""Skew handling: hot-key detection and salting (north rule: "skewed hot
cells (dense web regions) are salted and range-repartitioned before a
groupby-cell aggregate-sort shuffle").

Pattern: a cheap counting pre-pass over the key column finds keys whose
group size exceeds ``cap``; those are split into ``ceil(n / cap)`` salt
sub-groups.  Consumers either (a) aggregate per (key, salt) then combine
the small per-salt partials (associative aggregates), or (b) replicate
the group's shared side to every salt (the kNN candidate pattern in
knn.py).  The driver-side hot map is bounded by the key-space (spatial
cells), not the row count, so broadcasting it via ``ray.put`` is safe at
100 TB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DEFAULT_CAP = 1024
MAX_SALTS = 8  # replication-factor bound: candidate-replicating consumers
               # pay O(n_salts) duplication, so hot groups are split into
               # at most this many sub-groups (work per sub-group stays
               # bounded by the in-group pruning instead)


# Max buffered (key, count) partial rows for key_counts' driver-side
# combine before bailing to a distributed groupby (the volume-aware
# pixel_counts pattern; ~256 MB of int64 pairs at the bound).
KEY_COUNTS_DRIVER_LIMIT = 16_000_000


def key_counts(ds, key: str) -> dict[int, int]:
    """Exact group sizes for one int key column, computed with map-side
    partial counts (one row per key per batch crosses the wire).  The
    result is a DRIVER dict either way, so bounded partial volume
    streams straight to a driver np.unique combine — skipping Ray's
    sort-based groupby entirely (measured 8-9 s on a 1.28 M-partial
    input); above KEY_COUNTS_DRIVER_LIMIT it bails to the groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy()
        u, c = np.unique(k, return_counts=True)
        return pa.table({key: pa.array(u),
                         "cnt": pa.array(c.astype(np.int64))})

    part = ds.select_columns([key]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    ks, cs, total, overflow = [], [], 0, False
    for b in part.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ks.append(b[key].to_numpy())
        cs.append(b["cnt"].to_numpy())
        total += len(ks[-1])
        if total > KEY_COUNTS_DRIVER_LIMIT:
            overflow = True
            break
    if not overflow:
        if not ks:
            return {}
        k = np.concatenate(ks)
        uk, inv = np.unique(k, return_inverse=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, np.concatenate(cs))
        return dict(zip(uk.tolist(), sums.tolist()))
    del ks, cs  # release buffered partials before re-exec
    from ray.data.aggregate import Sum

    agg = part.groupby(key).aggregate(Sum("cnt", alias_name="cnt"))
    out = {}
    for b in agg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for kk, cc in zip(b[key].to_pylist(), b["cnt"].to_pylist()):
            out[kk] = cc
    return out


def salt_plan(counts: dict[int, int], cap: int = DEFAULT_CAP,
              max_salts: int = MAX_SALTS) -> dict[int, int]:
    """key -> number of salt buckets (1 for cold keys,
    min(ceil(n/cap), max_salts) hot)."""
    return {k: min(max(1, -(-n // cap)), max_salts)
            for k, n in counts.items() if n > cap}


def plan_lookup(plan: dict[int, int]):
    """Vectorized salt-plan lookup: plan dict -> ``n_salt(keys_arr)``
    returning the per-key salt-bucket count (1 for keys outside the
    plan).  The single implementation of the sorted-keys/searchsorted
    probe — knn's emit stage and its emitted-row estimator must agree
    exactly or partition sizing drifts from the actual emission."""
    if plan:
        k = np.fromiter(plan.keys(), dtype=np.int64)
        v = np.fromiter(plan.values(), dtype=np.int64)
        o = np.argsort(k)
        k, v = k[o], v[o]
    else:
        k = np.empty(0, np.int64)
        v = np.empty(0, np.int64)

    def n_salt(keys_arr: np.ndarray) -> np.ndarray:
        n = np.ones(len(keys_arr), dtype=np.int64)
        if len(k) and len(keys_arr):
            pos = np.clip(np.searchsorted(k, keys_arr), 0, len(k) - 1)
            hit = k[pos] == keys_arr
            n[hit] = v[pos[hit]]
        return n

    return n_salt


_SALT_MEMO: dict = {}


def add_salt(ds, key: str, plan: dict[int, int], id_col: str):
    """Append a deterministic ``salt`` column: id % n_salts(key), 0 for
    cold keys.  Use before groupby([key, "salt"]) with per-salt partial
    aggregation.

    A stateless TASK-pool fn (per-worker memoized plan, the
    fused_page_fn pattern), not an actor pool: a second actor pool in
    the same dataset pins another CPU even while idle, which deadlocks
    narrow sessions (2 CPUs: upstream pool + this pool starve the read
    task) — and task fns keep operator fusion available."""
    import ray

    plan_ref = ray.put(plan)
    memo_key = plan_ref.hex()

    def salter(batch: pa.Table) -> pa.Table:
        # single-slot memo (replace on key mismatch) so repeated salted
        # pipelines don't accumulate per-call plan arrays in the worker
        plan_sorted = _SALT_MEMO.get(memo_key)
        if plan_sorted is None:
            p = ray.get(plan_ref)
            if p:
                hot_keys = np.fromiter(p.keys(), dtype=np.int64)
                hot_r = np.fromiter(p.values(), dtype=np.int64)
                order = np.argsort(hot_keys)
                plan_sorted = (hot_keys[order], hot_r[order])
            else:
                plan_sorted = (np.array([], dtype=np.int64),
                               np.array([], dtype=np.int64))
            _SALT_MEMO.clear()
            _SALT_MEMO[memo_key] = plan_sorted
        hot_keys, hot_r = plan_sorted
        k = batch[key].to_numpy()
        ids = batch[id_col].to_numpy()
        n_salt = np.ones(len(k), dtype=np.int64)
        if len(hot_keys):
            # vectorized lookup over the (bounded) hot-key map
            pos = np.searchsorted(hot_keys, k)
            pos = np.clip(pos, 0, len(hot_keys) - 1)
            hit = hot_keys[pos] == k
            n_salt[hit] = hot_r[pos[hit]]
        salt = ids % n_salt
        return batch.append_column("salt", pa.array(salt))

    return ds.map_batches(salter, batch_format="pyarrow",
                          zero_copy_batch=True)


def arrow_bridge(ds, schema: "dict[str, pa.DataType]"):
    """Typed Arrow re-emission between a pandas ``map_groups`` output and
    a following all-to-all.

    Ray 2.49 pathological path (measured): pandas group-kernel blocks
    (including schema-less empties) feeding the next shuffle stall the
    exchange at ~zero CPU — 58 s for a 540 K-row two-key groupby that
    takes 6 s with one cheap Arrow normalization map in between.  Also
    shields downstream operators from schema-less empty blocks (the
    "RefBundle with a different schema" warnings)."""
    names = list(schema)

    def fix(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # the Ray 2.49 shield: schema-less/odd empty blocks
            return pa.table({n: pa.array([], t) for n, t in schema.items()})
        # a POPULATED batch missing a column is a real schema bug in the
        # upstream kernel — raise, never silently drop rows
        missing = [n for n in names if n not in batch.column_names]
        if missing:
            raise KeyError(
                f"arrow_bridge: populated batch missing {missing} "
                f"(has {batch.column_names})")
        return pa.table({n: batch[n] for n in names}).cast(
            pa.schema(schema))

    return ds.map_batches(fix, batch_format="pyarrow")
