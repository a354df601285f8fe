"""Distributed iterative graph algorithms over table-derived graphs.

The reference engine (NRCan/geo-inference) has no graph operators; this
module extends the engine for web-scale training-data pipelines, where
link-graph signals (host authority for quality weighting, crawl-frontier
prioritisation) need exactly this join-aggregate-per-round shape.  It is
the fixed-point sibling of the alternating-star connected components in
``polygonize.py``/``dedup.py``: one key-partitioned shuffle per round,
never an all-pairs step.

PageRank here is the fixed-iteration, INTEGER-EXACT variant: ranks are
parts-per-million int64 and every neighbour contribution is
floor-divided (``rank // outdeg``), so a DuckDB CTE chain reproduces the
result bit-for-bit — no float summation-order hazard.  The graph is the
part<->supplier bipartite graph derived from ``lineitem`` (node id
``2*partkey`` / ``2*suppkey + 1``; both edge directions, so every node
has out-degree >= 1 and the rank update needs no dangling-node term).

Scale shape (100 TB design point):
- the distinct-edge table is built with per-batch pre-dedup before the
  one global distinct shuffle, then SPILLED to parquet scratch
  (pools.spill_dir) because it is consumed once per iteration —
  disk-backed and column-pruned instead of plasma-pinned;
- per iteration the per-node contribution table is either BROADCAST
  (``ray.put`` + sorted-array ``searchsorted`` probe per batch) when the
  node count is under ``broadcast_cap`` — zero shuffles of the edge
  table beyond the incoming-sum groupby — or joined with Ray's native
  hash join sized by ``join_partitions_for`` on the EDGE side;
- the incoming-sum groupby is preceded by a per-batch partial sum per
  destination, so the shuffle carries at most (batches x nodes-touched)
  rows, not edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PR_SCALE = 1_000_000       # rank unit: parts-per-million
PR_ITERS = 3               # fixed iteration count (exact-oracle contract)
PR_DAMP_NUM = 85           # damping 0.85 as an integer ratio
PR_BASE = 150_000          # (1 - damping) * PR_SCALE
PR_BROADCAST_CAP = 5_000_000   # nodes; same bound as dedup_apply's drop set


def _edge_spill(sf_dir: str, work_dir: str | None,
                directed: bool = False):
    """Distinct edge table (src, dst) of the part<->supplier graph,
    spilled to parquet scratch (consumed once per iteration;
    disk-backed, not plasma-pinned).  Both directions by default
    (PageRank needs outdeg >= 1 everywhere); ``directed=True`` keeps
    only part -> supplier (the HITS hub -> authority orientation).
    Returns (path, n_edges) with the count taken from the spill
    footers — no data read."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from .pools import spill_dir

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])

    def edge_partial(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy().astype(np.int64) * 2
        s = batch["l_suppkey"].to_numpy().astype(np.int64) * 2 + 1
        if directed:
            t = pa.table({"src": pa.array(p), "dst": pa.array(s)})
        else:
            t = pa.table({"src": pa.array(np.concatenate([p, s])),
                          "dst": pa.array(np.concatenate([s, p]))})
        # per-batch pre-dedup: the global distinct shuffle then carries
        # (batches x local-distinct) rows, not 2x lineitem rows
        return t.group_by(["src", "dst"]).aggregate(
            [([], "count_all")]).select(["src", "dst"])

    distinct = li.map_batches(edge_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None) \
        .groupby(["src", "dst"]).count() \
        .select_columns(["src", "dst"])
    spill = spill_dir("hits_edges" if directed else "pagerank_edges",
                      work_dir)
    distinct.write_parquet(spill)
    n_edges = sum(pq.read_metadata(f).num_rows for f in
                  glob.glob(os.path.join(spill, "*.parquet")))
    return spill, n_edges


def _degrees(edges_ds):
    """(node, outdeg) via per-batch partial counts -> groupby Sum."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["src"].to_numpy(), return_counts=True)
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "d": pa.array(c.astype(np.int64))})

    return edges_ds.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None) \
        .groupby("node").aggregate(Sum("d", alias_name="outdeg"))


def pagerank(sf_dir: str, *, iters: int = PR_ITERS,
             broadcast_cap: int = PR_BROADCAST_CAP,
             work_dir: str | None = None):
    """Fixed-iteration integer PageRank over the part<->supplier graph.

    Returns a Dataset of (node, rank_ppm): rank_ppm starts at PR_SCALE
    and each round becomes ``PR_BASE + (PR_DAMP_NUM * sum_in(rank //
    outdeg)) // 100`` — all int64, so the DuckDB oracle matches exactly.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .pools import pool_caps
    from .relational import join_partitions_for

    spill, n_edges = _edge_spill(sf_dir, work_dir)

    def edges():
        return rd.read_parquet(spill, columns=["src", "dst"])

    deg = _degrees(edges())

    def inc_partial(batch: pa.Table) -> pa.Table:
        """Partial incoming-contribution sum per destination node."""
        d = batch["dst"].to_numpy()
        con = batch["contrib"].to_numpy()
        u, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, con)
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "i": pa.array(s)})

    def new_rank(inc_ds):
        def formula(batch: pa.Table) -> pa.Table:
            r = PR_BASE + (PR_DAMP_NUM
                           * batch["inc"].to_numpy()) // 100
            return pa.table({"node": batch["node"],
                             "rank_ppm": pa.array(r)})
        return inc_ds.map_batches(formula, batch_format="pyarrow",
                                  zero_copy_batch=True)

    # ---- broadcast path: node table fits the driver/worker heap ------
    nodes_list, deg_list = [], []
    n_nodes = 0
    for b in deg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        nodes_list.append(b["node"].to_numpy())
        deg_list.append(b["outdeg"].to_numpy())
        n_nodes += len(nodes_list[-1])
        if n_nodes > broadcast_cap:
            break

    if n_nodes <= broadcast_cap and n_nodes > 0:
        node_arr = np.concatenate(nodes_list)
        order = np.argsort(node_arr)
        node_arr = node_arr[order]
        deg_arr = np.concatenate(deg_list)[order]
        rank = np.full(n_nodes, PR_SCALE, dtype=np.int64)
        for _ in range(iters):
            contrib = rank // deg_arr
            cref = ray.put((node_arr, contrib))

            class AddContrib:
                def __init__(self):
                    self.nodes, self.contrib = ray.get(cref)

                def __call__(self, batch: pa.Table) -> pa.Table:
                    src = batch["src"].to_numpy()
                    idx = np.searchsorted(self.nodes, src)
                    b = batch.append_column(
                        "contrib", pa.array(self.contrib[idx]))
                    return inc_partial(b)

            inc = edges().map_batches(AddContrib, batch_format="pyarrow",
                                      concurrency=pool_caps(None)) \
                .groupby("node").aggregate(Sum("i", alias_name="inc"))
            # fold the node-bounded aggregate back into the rank array
            new = np.empty(n_nodes, dtype=np.int64)
            seen = 0
            for b in inc.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
                idx = np.searchsorted(node_arr, b["node"].to_numpy())
                new[idx] = (PR_BASE
                            + (PR_DAMP_NUM * b["inc"].to_numpy()) // 100)
                seen += len(idx)
            assert seen == n_nodes, "incoming sum lost a node"
            rank = new
        return rd.from_arrow(pa.table({
            "node": pa.array(node_arr), "rank_ppm": pa.array(rank)}))

    # ---- distributed path: native hash joins sized by the edge side --
    # deg is consumed 1 + 2*iters times below; materialize the
    # node-bounded table once instead of recomputing its groupby per
    # consumer (object-store spill covers the large-node case)
    deg = deg.materialize()
    state = deg.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "outdeg": b["outdeg"],
                            "rank_ppm": pa.array(np.full(
                                len(b), PR_SCALE, dtype=np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)
    np_edges = join_partitions_for(n_edges)
    for _ in range(iters):
        contrib = state.map_batches(
            lambda b: pa.table({
                "node": b["node"],
                "contrib": pa.array(b["rank_ppm"].to_numpy()
                                    // b["outdeg"].to_numpy())}),
            batch_format="pyarrow", zero_copy_batch=True)
        joined = edges().join(contrib, join_type="inner",
                              num_partitions=np_edges,
                              on=("src",), right_on=("node",))
        inc = joined.map_batches(inc_partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("i", alias_name="inc"))
        ranked = new_rank(inc)
        state = ranked.join(deg.map_batches(
            lambda b: pa.table({"dnode": b["node"],
                                "outdeg": b["outdeg"]}),
            batch_format="pyarrow", zero_copy_batch=True),
            join_type="inner",
            num_partitions=join_partitions_for(max(n_nodes, 1)),
            on=("node",), right_on=("dnode",)) \
            .select_columns(["node", "outdeg", "rank_ppm"])
    return state.select_columns(["node", "rank_ppm"])


def pagerank_oracle_sql(iters: int = PR_ITERS) -> str:
    """DuckDB CTE chain mirroring ``pagerank`` bit-for-bit (all-integer
    arithmetic; ``//`` floor division on both sides)."""
    sql = [f"""
WITH e0 AS (
  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem),
edges AS (SELECT src, dst FROM e0
          UNION ALL SELECT dst, src FROM e0),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank_ppm FROM deg)"""]
    for t in range(1, iters + 1):
        sql.append(f""",
i{t} AS (SELECT e.dst AS node,
                SUM(r.rank_ppm // d.outdeg) AS inc
         FROM edges e
         JOIN r{t - 1} r ON e.src = r.node
         JOIN deg d ON e.src = d.node
         GROUP BY e.dst),
r{t} AS (SELECT node,
                CAST({PR_BASE} + ({PR_DAMP_NUM} * inc) // 100
                     AS BIGINT) AS rank_ppm
         FROM i{t})""")
    sql.append(f"\nSELECT node, rank_ppm FROM r{iters}")
    return "".join(sql)


HITS_SCALE = 1_000_000     # score unit after each max-normalization
HITS_ITERS = 2             # fixed iteration count (exact-oracle contract)


def hits(sf_dir: str, *, iters: int = HITS_ITERS,
         broadcast_cap: int = PR_BROADCAST_CAP,
         work_dir: str | None = None):
    """Fixed-iteration integer HITS (Kleinberg '99 — public algorithm)
    over the DIRECTED part -> supplier graph: parts are hubs,
    suppliers are authorities.

    Integer-exact normalization replaces the usual L2 norm: after each
    sweep the vector is rescaled to ``x * HITS_SCALE // max(x)`` (all
    int64 floor arithmetic), so a DuckDB CTE chain reproduces every
    score bit-for-bit.  Per iteration: ``auth[v] = sum of hub[u] over
    edges (u, v)`` then rescale; ``hub[u] = sum of auth[v]`` then
    rescale.  Sums stay below 2^63 while max-degree * HITS_SCALE^2
    < 2^63 (degree < ~9.2e6).  The binding bound is whichever side's
    degree is largest, so BOTH paths assert per-sweep on the max
    aggregated sum before the rescale multiply — that covers hub
    out-degree and authority in-degree alike.

    Scale shape mirrors :func:`pagerank`: the distinct directed edge
    table is spilled once and re-read per sweep; under
    ``broadcast_cap`` nodes the score vector is broadcast (ray.put +
    searchsorted probe, shuffles carry per-batch partial sums only);
    above it each sweep is one hash join sized by the edge count plus
    a scalar Max aggregate.

    Returns (node, is_hub, score)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from .pools import pool_caps
    from .relational import join_partitions_for

    spill, n_edges = _edge_spill(sf_dir, work_dir, directed=True)

    if n_edges == 0:
        # empty edge table: no hubs, no authorities (kcore's
        # explicit-empty contract — the empty spill has no readable
        # schema and the distributed Max would raise)
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "is_hub": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())}))

    def edges():
        return rd.read_parquet(spill, columns=["src", "dst"])

    def sum_partial(key: str):
        def part(batch: pa.Table) -> pa.Table:
            d = batch[key].to_numpy()
            con = batch["contrib"].to_numpy()
            u, inv = np.unique(d, return_inverse=True)
            s = np.zeros(len(u), dtype=np.int64)
            np.add.at(s, inv, con)
            return pa.table({"node": pa.array(u.astype(np.int64)),
                             "s": pa.array(s)})
        return part

    # node inventories (hub side = distinct src, auth side = distinct
    # dst) via the shared per-batch-partial degree pattern
    def side_nodes(key: str):
        def part(batch: pa.Table) -> pa.Table:
            u = np.unique(batch[key].to_numpy())
            return pa.table({"node": pa.array(u.astype(np.int64)),
                             "d": pa.array(np.ones(len(u), np.int64))})
        return edges().map_batches(part, batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   batch_size=None) \
            .groupby("node").aggregate(Sum("d", alias_name="deg"))

    hub_nodes = side_nodes("src")

    hubs, n_hub = [], 0
    for b in hub_nodes.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"):
        hubs.append(b["node"].to_numpy())
        n_hub += len(hubs[-1])
        if n_hub > broadcast_cap:
            break

    # n_hub >= 1 here: n_edges == 0 returned above, and every edge
    # contributes a src to side_nodes('src')
    if n_hub <= broadcast_cap:
        # ---- broadcast path -----------------------------------------
        hub_arr = np.concatenate(hubs)
        order = np.argsort(hub_arr)
        hub_arr = hub_arr[order]
        hub = np.full(n_hub, HITS_SCALE, dtype=np.int64)
        auth_arr = auth = None

        def sweep(src_key, dst_key, nodes, scores):
            """One half-iteration: push ``scores`` (indexed by sorted
            ``nodes`` = the src side) across edges, return the dst
            side's (sorted nodes, rescaled scores)."""
            cref = ray.put((nodes, scores))

            class Push:
                def __init__(self):
                    self.nodes, self.scores = ray.get(cref)

                def __call__(self, batch: pa.Table) -> pa.Table:
                    src = batch[src_key].to_numpy()
                    idx = np.searchsorted(self.nodes, src)
                    b = batch.append_column(
                        "contrib", pa.array(self.scores[idx]))
                    return sum_partial(dst_key)(b)

            agg = edges().map_batches(Push, batch_format="pyarrow",
                                      concurrency=pool_caps(None)) \
                .groupby("node").aggregate(Sum("s", alias_name="s"))
            nl, sl = [], []
            for b in agg.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
                nl.append(b["node"].to_numpy())
                sl.append(b["s"].to_numpy())
            nn = np.concatenate(nl)
            ss = np.concatenate(sl)
            o = np.argsort(nn)
            nn, ss = nn[o], ss[o]
            mx = max(1, int(ss.max()))
            assert mx < (1 << 63) // HITS_SCALE, \
                "per-sweep sum overflows int64 HITS rescale"
            return nn, ss * HITS_SCALE // mx

        for _ in range(iters):
            auth_arr, auth = sweep("src", "dst", hub_arr, hub)
            hub_arr2, hub = sweep("dst", "src", auth_arr, auth)
            assert len(hub_arr2) == n_hub
            hub_arr = hub_arr2
        return rd.from_arrow(pa.table({
            "node": pa.array(np.concatenate([hub_arr, auth_arr])),
            "is_hub": pa.array(np.concatenate(
                [np.ones(len(hub_arr), np.int64),
                 np.zeros(len(auth_arr), np.int64)])),
            "score": pa.array(np.concatenate([hub, auth]))}))

    # ---- distributed path: per sweep one hash join + scalar Max ------
    np_edges = join_partitions_for(n_edges)
    state = hub_nodes.map_batches(
        lambda b: pa.table({"node": b["node"],
                            "s": pa.array(np.full(len(b), HITS_SCALE,
                                                  dtype=np.int64))}),
        batch_format="pyarrow", zero_copy_batch=True)

    def sweep_ds(state_ds, src_key, dst_key):
        joined = edges().join(
            state_ds.map_batches(
                lambda b: pa.table({"jnode": b["node"],
                                    "contrib": b["s"]}),
                batch_format="pyarrow", zero_copy_batch=True),
            join_type="inner", num_partitions=np_edges,
            on=(src_key,), right_on=("jnode",))
        agg = joined.map_batches(sum_partial(dst_key),
                                 batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("s", alias_name="s")) \
            .materialize()
        mx = max(1, int(agg.aggregate(Max("s"))["max(s)"]))
        assert mx < (1 << 63) // HITS_SCALE, \
            "per-sweep sum overflows int64 HITS rescale"

        def rescale(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch["node"],
                "s": pa.array(batch["s"].to_numpy()
                              * HITS_SCALE // mx)})

        return agg.map_batches(rescale, batch_format="pyarrow",
                               zero_copy_batch=True)

    auth_state = None
    for _ in range(iters):
        auth_state = sweep_ds(state, "src", "dst")
        state = sweep_ds(auth_state, "dst", "src")

    def tag(is_hub: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch["node"],
                "is_hub": pa.array(np.full(len(batch), is_hub,
                                           dtype=np.int64)),
                "score": batch["s"]})
        return f

    return state.map_batches(tag(1), batch_format="pyarrow") \
        .union(auth_state.map_batches(tag(0), batch_format="pyarrow"))


def hits_oracle_sql(iters: int = HITS_ITERS) -> str:
    """DuckDB CTE chain mirroring ``hits`` bit-for-bit (integer floor
    arithmetic, max-normalization per half-sweep)."""
    sql = [f"""
WITH e AS (
  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem),
h0 AS (SELECT DISTINCT src AS node, CAST({HITS_SCALE} AS BIGINT) AS s
       FROM e)"""]
    for t in range(1, iters + 1):
        sql.append(f""",
a{t}r AS (SELECT e.dst AS node, CAST(SUM(h.s) AS BIGINT) AS s
          FROM e JOIN h{t - 1} h ON h.node = e.src GROUP BY e.dst),
a{t} AS (SELECT node, CAST(s * {HITS_SCALE}
                // GREATEST(1, (SELECT MAX(s) FROM a{t}r)) AS BIGINT)
                AS s
         FROM a{t}r),
h{t}r AS (SELECT e.src AS node, CAST(SUM(a.s) AS BIGINT) AS s
          FROM e JOIN a{t} a ON a.node = e.dst GROUP BY e.src),
h{t} AS (SELECT node, CAST(s * {HITS_SCALE}
                // GREATEST(1, (SELECT MAX(s) FROM h{t}r)) AS BIGINT)
                AS s
         FROM h{t}r)""")
    sql.append(f"""
SELECT node, CAST(1 AS BIGINT) AS is_hub, s AS score FROM h{iters}
UNION ALL
SELECT node, CAST(0 AS BIGINT) AS is_hub, s AS score FROM a{iters}""")
    return "".join(sql)


KCORE_MAX_ROUNDS = 8       # peel-round bound (exact-oracle contract)


def _median_from_hist(vals: np.ndarray, counts: np.ndarray) -> int:
    """Exact lower median from a (value, count) histogram — the
    element at sorted index (n-1)//2, matching DuckDB
    quantile_disc(x, 0.5)."""
    o = np.argsort(vals)
    vals, counts = vals[o], counts[o]
    cum = np.cumsum(counts)
    n = int(cum[-1])
    return int(vals[np.searchsorted(cum, (n - 1) // 2 + 1)])


def kcore(sf_dir: str, *, k: int | None = None,
          max_rounds: int = KCORE_MAX_ROUNDS,
          broadcast_cap: int = PR_BROADCAST_CAP,
          work_dir: str | None = None):
    """k-core of the undirected part<->supplier graph by parallel
    peeling (Matula & Beck '83 degeneracy peeling, simultaneous-removal
    variant): each round drops EVERY node whose degree within the
    current subgraph is < k, until a fixpoint.  ``k`` defaults to the
    exact lower MEDIAN of the initial degree distribution, computed
    scale-safely from the (degree value, node count) histogram — the
    histogram is distinct-degree-sized, never node-sized, so the
    driver fold is bounded even at 10^12 edges.

    Rounds are bounded by ``max_rounds`` (asserted at convergence —
    the SQL oracle unrolls exactly this many rounds, so an input that
    needs more must raise, not silently diverge from the mirror).

    Scale shape mirrors :func:`pagerank`: spilled distinct edge table
    re-read per round; alive set under ``broadcast_cap`` is a sorted
    broadcast array probed per batch (shuffles carry per-batch partial
    degree sums only); above it each round is two hash semi-joins
    sized by the edge count.

    Returns (node, core_deg): the surviving nodes with their degree
    inside the core."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .pools import pool_caps
    from .relational import join_partitions_for

    spill, n_edges = _edge_spill(sf_dir, work_dir)

    def edges():
        return rd.read_parquet(spill, columns=["src", "dst"])

    deg = _degrees(edges()).materialize()

    if k is None:
        # (degree value -> node count) histogram: tiny by construction
        def hist_partial(batch: pa.Table) -> pa.Table:
            u, c = np.unique(batch["outdeg"].to_numpy(),
                             return_counts=True)
            return pa.table({"v": pa.array(u.astype(np.int64)),
                             "c": pa.array(c.astype(np.int64))})

        hist = deg.map_batches(hist_partial, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None) \
            .groupby("v").aggregate(Sum("c", alias_name="c"))
        vs, cs = [], []
        for b in hist.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
            vs.append(b["v"].to_numpy())
            cs.append(b["c"].to_numpy())
        k = _median_from_hist(np.concatenate(vs), np.concatenate(cs))

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "core_deg": pa.array([], pa.int64())})

    # ---- broadcast path ----------------------------------------------
    nodes_list, n_nodes = [], 0
    for b in deg.iter_batches(batch_size=65536, batch_format="pyarrow"):
        nodes_list.append(b["node"].to_numpy())
        n_nodes += len(nodes_list[-1])
        if n_nodes > broadcast_cap:
            break

    if n_nodes <= broadcast_cap:
        alive = np.sort(np.concatenate(nodes_list)) if nodes_list \
            else np.array([], dtype=np.int64)

        def alive_degrees(alive_arr: np.ndarray):
            aref = ray.put(alive_arr)

            class DegAlive:
                def __init__(self):
                    self.alive = ray.get(aref)

                def __call__(self, batch: pa.Table) -> pa.Table:
                    s = batch["src"].to_numpy()
                    d = batch["dst"].to_numpy()
                    keep = np.isin(s, self.alive) & \
                        np.isin(d, self.alive)
                    u, c = np.unique(s[keep], return_counts=True)
                    return pa.table({
                        "node": pa.array(u.astype(np.int64)),
                        "c": pa.array(c.astype(np.int64))})

            agg = edges().map_batches(DegAlive, batch_format="pyarrow",
                                      concurrency=pool_caps(None)) \
                .groupby("node").aggregate(Sum("c", alias_name="c"))
            nl, cl = [], []
            for b in agg.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
                nl.append(b["node"].to_numpy())
                cl.append(b["c"].to_numpy())
            if not nl:
                return (np.array([], dtype=np.int64),
                        np.array([], dtype=np.int64))
            nn = np.concatenate(nl)
            cc = np.concatenate(cl)
            o = np.argsort(nn)
            return nn[o], cc[o]

        for rnd in range(max_rounds + 1):
            if len(alive) == 0:
                return rd.from_arrow(empty)
            nn, cc = alive_degrees(alive)
            keepm = cc >= k
            # isolated alive nodes (all edges gone) have no degree row
            new_alive = nn[keepm]
            if len(new_alive) == len(alive) and \
                    np.array_equal(new_alive, alive):
                return rd.from_arrow(pa.table({
                    "node": pa.array(nn[keepm]),
                    "core_deg": pa.array(cc[keepm])}))
            alive = new_alive
        raise AssertionError(
            f"k-core did not converge in {max_rounds} rounds "
            "(oracle contract)")

    # ---- distributed path: two semi-joins per round -------------------
    np_edges = join_partitions_for(n_edges)
    alive_ds = deg.select_columns(["node"]).materialize()
    prev_n = alive_ds.count()

    def deg_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch["src"].to_numpy(), return_counts=True)
        return pa.table({"node": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    for rnd in range(max_rounds + 1):
        if prev_n == 0:
            return rd.from_arrow(empty)
        dsub = edges().join(
            alive_ds.map_batches(
                lambda b: pa.table({"anode": b["node"]}),
                batch_format="pyarrow", zero_copy_batch=True),
            join_type="inner", num_partitions=np_edges,
            on=("src",), right_on=("anode",)) \
            .join(alive_ds.map_batches(
                lambda b: pa.table({"bnode": b["node"]}),
                batch_format="pyarrow", zero_copy_batch=True),
                join_type="inner", num_partitions=np_edges,
                on=("dst",), right_on=("bnode",)) \
            .map_batches(deg_partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("c", alias_name="c")) \
            .materialize()

        def keep_core(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.greater_equal(batch["c"],
                                              pa.scalar(int(k))))
            return t

        core = dsub.map_batches(keep_core, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()
        n_now = core.count()
        if n_now == prev_n:
            return core.map_batches(
                lambda b: pa.table({"node": b["node"],
                                    "core_deg": b["c"]}),
                batch_format="pyarrow", zero_copy_batch=True)
        prev_n = n_now
        alive_ds = core.select_columns(["node"]).materialize()
    raise AssertionError(
        f"k-core did not converge in {max_rounds} rounds "
        "(oracle contract)")


def kcore_oracle_sql(max_rounds: int = KCORE_MAX_ROUNDS) -> str:
    """DuckDB chained-CTE mirror of ``kcore`` (adaptive median k,
    ``max_rounds`` unrolled peel rounds, final in-core degrees).
    Exact by construction when the engine converges within the same
    round bound (it asserts that).

    Every a{t} is AS MATERIALIZED: each is referenced TWICE by the
    next round's degree join, and DuckDB's default inlining then
    re-evaluates the whole prefix per reference — a 2^rounds blowup
    that ran the sf0.1 oracle out of temp disk.  Materialization makes
    the chain linear (duckdb >= 0.9 syntax)."""
    sql = ["""
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem),
edges AS MATERIALIZED (SELECT src, dst FROM e0
          UNION ALL SELECT dst, src FROM e0),
d0 AS (SELECT src AS node, COUNT(*) AS c FROM edges GROUP BY src),
kv AS MATERIALIZED (SELECT quantile_disc(c, 0.5) AS k FROM d0),
a0 AS MATERIALIZED (SELECT node FROM d0)"""]
    for t in range(1, max_rounds + 1):
        sql.append(f""",
d{t} AS (SELECT e.src AS node, COUNT(*) AS c
         FROM edges e
         JOIN a{t - 1} x ON x.node = e.src
         JOIN a{t - 1} y ON y.node = e.dst
         GROUP BY e.src),
a{t} AS MATERIALIZED (SELECT node FROM d{t}
                      WHERE c >= (SELECT k FROM kv))""")
    R = max_rounds
    sql.append(f""",
df AS (SELECT e.src AS node, COUNT(*) AS c
       FROM edges e
       JOIN a{R} x ON x.node = e.src
       JOIN a{R} y ON y.node = e.dst
       GROUP BY e.src)
SELECT node, c AS core_deg FROM df
WHERE c >= (SELECT k FROM kv)""")
    return "".join(sql)


TRI_MAX_PART_DEG = 4096    # per-part supplier-count cap (pair blowup)
TRI_MAX_FWD_DEG = 65_536   # per-node forward-degree cap (wedge blowup)
TRI_NODE_BITS = 31         # suppkeys must fit in 31 bits for packing


def triangles(sf_dir: str):
    """Per-node triangle counts over the co-supplier graph (suppliers
    sharing a part are adjacent) — the clustering-coefficient /
    community-density primitive, distributed with the classic
    compact-forward shape and NO all-pairs step anywhere:

    1. distinct (part, supplier) pairs (map-side pre-dedup + one
       groupby);
    2. per-part supplier pairs u<v (hash-partitioned kernel, per-part
       degree capped at TRI_MAX_PART_DEG with a loud bail), then one
       distinct groupby on the PACKED edge ``u<<32|v``;
    3. wedges: edges hash-partition on their lower endpoint u; one
       vectorized kernel emits (u, v<<32|w) for every ordered neighbor
       pair v<w — node-id ordering, so each triangle is generated
       exactly once (for a dense component this equals the triangle
       count itself, the compact-forward optimum);
    4. closure probe: wedges UNION the edge table (tagged u=-1),
       hash-partitioned on the packed (v,w) key; the per-partition
       kernel resolves membership with one sorted searchsorted and
       emits per-node partial counts (each closed triangle contributes
       its three corners);
    5. final groupby Sum -> (s_suppkey, n_triangles).

    The shuffles carry distinct pairs, wedges, and count partials —
    never lineitem rows.  Wedge volume is sum_u C(deg_hi(u), 2); for
    web-scale sparse graphs the node ordering bounds it by arboricity
    (document: TPC-H's co-supplier graph is pathologically dense, a
    worst case real link graphs don't hit)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .relational import _hash_partitioned, _parquet_rows

    li_path = f"{sf_dir}/lineitem.parquet"
    li = rd.read_parquet(li_path, columns=["l_partkey", "l_suppkey"])

    def ps_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"p": batch["l_partkey"], "s": batch["l_suppkey"]})
        return t.group_by(["p", "s"]).aggregate(
            [([], "count_all")]).select(["p", "s"])

    ps = li.map_batches(ps_partial, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=None) \
        .groupby(["p", "s"]).count().select_columns(["p", "s"])

    def pair_kernel(g):
        import pandas as pd

        g = g.sort_values(["p", "s"], kind="stable").reset_index(
            drop=True)
        p = g["p"].to_numpy()
        s = g["s"].to_numpy()
        if len(s) and (s.max() >= 1 << TRI_NODE_BITS or s.min() < 0):
            raise ValueError("triangles: suppkey outside 31-bit range")
        new = np.ones(len(g), dtype=bool)
        new[1:] = p[1:] != p[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        if len(sizes) and sizes.max() > TRI_MAX_PART_DEG:
            raise ValueError("triangles: a part exceeds "
                             f"{TRI_MAX_PART_DEG} suppliers")
        outs = []
        for k in np.unique(sizes):
            if k < 2:
                continue
            seg = starts[sizes == k]
            mat = s[(seg[:, None] + np.arange(k)[None, :])]
            ia, ib = np.triu_indices(int(k), 1)
            u = mat[:, ia].ravel()
            v = mat[:, ib].ravel()
            outs.append(pd.DataFrame({"e": (u << 32) | v}))
        if not outs:
            return pd.DataFrame({"e": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    raw_pairs = _hash_partitioned(ps, "p", pair_kernel,
                                  rows_hint=_parquet_rows(li_path))

    def e_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"e": pa.array(
            np.unique(batch["e"].to_numpy()))})

    edges = raw_pairs.map_batches(e_partial, batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=None) \
        .groupby("e").count().select_columns(["e"])
    edges = edges.materialize()   # consumed twice: wedges + probe side
    n_edges = edges.count()

    def with_u(batch: pa.Table) -> pa.Table:
        e = batch["e"].to_numpy()
        return pa.table({"u": pa.array(e >> 32), "e": batch["e"]})

    keyed = edges.map_batches(with_u, batch_format="pyarrow",
                              zero_copy_batch=True)

    # exact wedge volume = sum_u C(fwd_deg(u), 2), computed
    # DISTRIBUTED (per-node degrees never reach the driver): one
    # degree groupby over the edge table, one scalar Sum.  Sizes the
    # wedge and closure stages honestly (the earlier n_edges*8 guess
    # under-partitions dense graphs) and drives the loud forward-
    # degree bail below.
    def deg_partial(batch: pa.Table) -> pa.Table:
        uu, cc = np.unique(batch["u"].to_numpy(), return_counts=True)
        return pa.table({"node": pa.array(uu.astype(np.int64)),
                         "d": pa.array(cc.astype(np.int64))})

    from ray.data.aggregate import Max as _Max

    deg = keyed.map_batches(deg_partial, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None) \
        .groupby("node").aggregate(Sum("d", alias_name="d"))

    def wedge_count(batch: pa.Table) -> pa.Table:
        d = batch["d"].to_numpy()
        return pa.table({"w": pa.array(d * (d - 1) // 2),
                         "dmax": batch["d"]})

    stats = deg.map_batches(wedge_count, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .aggregate(Sum("w", alias_name="n_wedges"),
                   _Max("dmax", alias_name="max_fwd_deg"))
    n_wedges = int(stats["n_wedges"] or 0)
    max_fwd = int(stats["max_fwd_deg"] or 0)
    if max_fwd > TRI_MAX_FWD_DEG:
        raise ValueError(
            f"triangles: a node's forward degree ({max_fwd}) exceeds "
            f"{TRI_MAX_FWD_DEG}; one wedge kernel would materialize "
            "C(deg, 2) rows — re-orient edges by degree order or raise "
            "the cap deliberately")

    def wedge_kernel(g):
        import pandas as pd

        g = g.sort_values(["u", "e"], kind="stable").reset_index(
            drop=True)
        u = g["u"].to_numpy()
        v = (g["e"].to_numpy() & 0x7FFFFFFF)
        new = np.ones(len(g), dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        outs = []
        for k in np.unique(sizes):
            if k < 2:
                continue
            seg = starts[sizes == k]
            mat = v[(seg[:, None] + np.arange(k)[None, :])]
            ia, ib = np.triu_indices(int(k), 1)
            uu = np.repeat(u[seg], len(ia))
            outs.append(pd.DataFrame({
                "vw": (mat[:, ia].ravel() << 32) | mat[:, ib].ravel(),
                "u": uu}))
        if not outs:
            return pd.DataFrame({"vw": pd.Series([], dtype=np.int64),
                                 "u": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    wedges = _hash_partitioned(keyed, "u", wedge_kernel,
                               rows_hint=max(1, n_wedges))

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"vw": batch["e"],
                         "u": pa.array(np.full(len(batch), -1,
                                               np.int64))})

    probe_in = wedges.union(edges.map_batches(
        tag_edges, batch_format="pyarrow", zero_copy_batch=True))

    def close_kernel(g):
        import pandas as pd

        vw = g["vw"].to_numpy()
        u = g["u"].to_numpy()
        is_edge = u < 0
        evw = np.sort(vw[is_edge])
        wvw = vw[~is_edge]
        wu = u[~is_edge]
        pos = np.searchsorted(evw, wvw)
        pos_c = np.minimum(pos, max(0, len(evw) - 1))
        hit = np.zeros(len(wvw), dtype=bool) if not len(evw) else \
            (evw[pos_c] == wvw) & (pos < len(evw))
        tvw = wvw[hit]
        nodes = np.concatenate([wu[hit], tvw >> 32,
                                tvw & 0x7FFFFFFF])
        un, c = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": un.astype(np.int64),
                             "c": c.astype(np.int64)})

    partials = _hash_partitioned(probe_in, "vw", close_kernel,
                                 rows_hint=max(1, n_wedges + n_edges))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"s_suppkey": batch["node"],
                         "n_triangles": batch["n_triangles"]})

    return partials.groupby("node").aggregate(
        Sum("c", alias_name="n_triangles")) \
        .map_batches(rename, batch_format="pyarrow",
                     zero_copy_batch=True)


# graph_components: congruence-class sparsification keeps the test
# graph multi-component (the full part<->supplier graph is one giant
# component at every sf); both predicates are integer/float-exact in
# the SQL mirror
CC_QTY_MAX = 2.0
CC_MOD = 7


def graph_components(sf_dir: str, *, qty_max: float = CC_QTY_MAX,
                     mod: int = CC_MOD):
    """Connected components of the sparsified part<->supplier graph
    (edges where ``l_quantity < qty_max`` and part/supplier agree mod
    ``mod``): every node with at least one edge labeled with its
    component's minimum node id.

    Engine shape: per-batch pre-deduped edge emit -> distinct pair
    groupby -> :func:`dedup.distributed_components` (alternating
    star-contraction rounds, asserted fixpoint) -> one (node, label)
    union + Min aggregate (a root labels itself).  The SQL mirror is a
    recursive-CTE transitive closure — O(component^2) rows, viable
    because the sparsified test graph is small; the engine path is the
    scale shape (star contraction is O(E) per round).

    Returns (node, comp)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from .dedup import distributed_components

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey",
                                  "l_quantity"])

    def edge_partial(batch: pa.Table) -> pa.Table:
        p = batch["l_partkey"].to_numpy().astype(np.int64)
        s = batch["l_suppkey"].to_numpy().astype(np.int64)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        m = (q < qty_max) & (p % mod == s % mod)
        # doc_a < doc_b invariant: part ids are even, supplier ids odd
        a = np.minimum(p[m] * 2, s[m] * 2 + 1)
        b = np.maximum(p[m] * 2, s[m] * 2 + 1)
        return pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)}) \
            .group_by(["doc_a", "doc_b"]).aggregate(
                [([], "count_all")]).select(["doc_a", "doc_b"])

    pairs = li.map_batches(edge_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None) \
        .groupby(["doc_a", "doc_b"]).count() \
        .select_columns(["doc_a", "doc_b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "comp": pa.array([], pa.int64())}))

    labels = distributed_components(pairs, n_pairs)

    def self_rows(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([batch["doc_a"].to_numpy(),
                                      batch["doc_b"].to_numpy()]))
        return pa.table({"doc_id": pa.array(u.astype(np.int64)),
                         "cluster": pa.array(u.astype(np.int64))})

    nodes = pairs.map_batches(self_rows, batch_format="pyarrow",
                              zero_copy_batch=True)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["doc_id"],
                         "comp": batch["min(cluster)"]})

    return labels.union(nodes).groupby("doc_id") \
        .aggregate(Min("cluster")) \
        .map_batches(rename, batch_format="pyarrow",
                     zero_copy_batch=True)
