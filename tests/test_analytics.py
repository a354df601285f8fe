"""Tests for the analytics module (round-4 session-2 operators):
interval union, trigram mining, NTILE bucketing, CUBE grouping sets,
per-dimension embedding moments, the Pareto skyline, and the integer
EWMA fold.

These pin the SEMANTICS (island merging, NTILE remainder split,
dominance ties, fold order) on tiny hand-checkable inputs;
scripts/compare.py covers value equality vs DuckDB on the shared
tables.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows, name="ev"):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    d = tmp_path / name
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    return str(d)


US = 1_000_000
MIN30 = 1_800_000_000


def test_interval_union_merges_overlaps_and_splits_gaps(
        ray_session, tmp_path):
    from geo_inference_ray.analytics import interval_union

    # user 1: two events 10 min apart (one island, 40 min covered),
    # then one event 2 h later (second island, 30 min covered).
    # user 2: one event.
    base = 1_700_000_000 * US
    rows = [
        (1, base, 1, "view"),
        (2, base + 600 * US, 1, "view"),
        (3, base + 7200 * US, 1, "view"),
        (4, base, 2, "click"),
    ]
    d = _write_events(tmp_path, rows)
    out = interval_union(d).to_pandas().set_index("user_id")
    assert out.loc[1, "n_sessions"] == 2
    assert out.loc[1, "covered_us"] == (600 * US + MIN30) + MIN30
    assert out.loc[2, "n_sessions"] == 1
    assert out.loc[2, "covered_us"] == MIN30


def test_interval_union_touching_endpoint_does_not_split(
        ray_session, tmp_path):
    from geo_inference_ray.analytics import interval_union

    # second event starts EXACTLY at the first interval's end: the
    # oracle's `s > pmax` is strict, so they merge into one island
    base = 1_700_000_000 * US
    rows = [(1, base, 7, "a"), (2, base + MIN30, 7, "a")]
    d = _write_events(tmp_path, rows)
    out = interval_union(d).to_pandas()
    assert int(out["n_sessions"].iloc[0]) == 1
    assert int(out["covered_us"].iloc[0]) == 2 * MIN30


def test_trigram_paths_counts_user_ordered_triples(ray_session, tmp_path):
    from geo_inference_ray.analytics import trigram_paths

    base = 1_700_000_000 * US
    # user 1 path a,b,c,b -> trigrams (a,b,c), (b,c,b); user 2 too
    # short for any trigram
    rows = [
        (1, base + 1, 1, "a"), (2, base + 2, 1, "b"),
        (3, base + 3, 1, "c"), (4, base + 4, 1, "b"),
        (5, base + 1, 2, "a"), (6, base + 2, 2, "b"),
    ]
    d = _write_events(tmp_path, rows)
    out = trigram_paths(d).to_pandas()
    got = {(r.t1, r.t2, r.t3): r.cnt for r in out.itertuples()}
    assert got == {("a", "b", "c"): 1, ("b", "c", "b"): 1}


def test_trigram_paths_ties_broken_by_event_id(ray_session, tmp_path):
    from geo_inference_ray.analytics import trigram_paths

    base = 1_700_000_000 * US
    # identical ts: order must follow event_id -> path is x,y,z
    rows = [(3, base, 5, "z"), (1, base, 5, "x"), (2, base, 5, "y")]
    d = _write_events(tmp_path, rows)
    out = trigram_paths(d).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["t1"], out.iloc[0]["t2"], out.iloc[0]["t3"]) \
        == ("x", "y", "z")


def test_ntile_remainder_goes_to_leading_tiles(ray_session, tmp_path):
    from geo_inference_ray.analytics import ntile_buckets

    # 6 docs in one lang: NTILE(4) -> sizes 2,2,1,1 (SQL remainder
    # rule), ordered by (n_chars, doc_id)
    t = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array(["x"] * 6, pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["s"] * 6, pa.string()),
        "n_chars": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = ntile_buckets(str(d)).to_pandas().sort_values("tile")
    assert list(out["cnt"]) == [2, 2, 1, 1]
    assert list(out["min_chars"]) == [10, 30, 50, 60]
    assert list(out["max_chars"]) == [20, 40, 50, 60]


def test_cube_counts_emits_all_four_grouping_sets(ray_session, sf_dir):
    from geo_inference_ray.analytics import cube_counts

    out = cube_counts(sf_dir).to_pandas()
    # rolled-up dims carry the '(all)' sentinel (plain strings — NULL
    # markers hash-diverge across duckdb versions driver-side)
    lv, sv = out["lang"] != "(all)", out["source"] != "(all)"
    fine = out[lv & sv]
    by_lang = out[lv & ~sv]
    by_src = out[~lv & sv]
    total = out[~lv & ~sv]
    assert len(total) == 1
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert int(total["cnt"].iloc[0]) == n_docs
    assert int(fine["cnt"].sum()) == n_docs
    assert int(by_lang["cnt"].sum()) == n_docs
    assert int(by_src["cnt"].sum()) == n_docs
    assert int(fine["chars"].sum()) == int(total["chars"].iloc[0])


def test_dim_variance_matches_numpy(ray_session, sf_dir):
    from geo_inference_ray.analytics import dim_variance

    out = dim_variance(sf_dir).to_pandas().set_index("dim").sort_index()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")["embedding"]
    mat = np.stack(emb.to_numpy())
    q = np.floor(1000.0 * mat.astype(np.float64)).astype(np.int64)
    assert (out["n"] == len(mat)).all()
    np.testing.assert_array_equal(out["s1"].to_numpy(), q.sum(axis=0))
    np.testing.assert_array_equal(out["s2"].to_numpy(),
                                  (q * q).sum(axis=0))


def test_skyline_keeps_ties_and_drops_dominated(ray_session):
    from geo_inference_ray.analytics import _skyline_kernel

    # (n_words, n_chars): maximize words, minimize chars.
    # rows: A(5,10) B(5,10) duplicate-of-A C(5,12) dominated-by-A
    #       D(7,20) frontier  E(3,5) frontier  F(3,9) dominated-by-E
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "n_chars": pa.array([10, 10, 12, 20, 5, 9], pa.int64()),
        "n_words": pa.array([5, 5, 5, 7, 3, 3], pa.int64())})
    out = _skyline_kernel(t)
    assert sorted(out["doc_id"].to_pylist()) == [0, 1, 3, 4]


def test_skyline_local_then_merge_equals_global(ray_session, sf_dir):
    from geo_inference_ray.analytics import skyline_docs

    out = skyline_docs(sf_dir).to_pandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "n_chars"])
    w = docs["text"].str.split(" ").map(len).to_numpy()
    c = docs["n_chars"].to_numpy()
    keep = []
    for i in range(len(docs)):
        dom = ((w >= w[i]) & (c <= c[i]) & ((w > w[i]) | (c < c[i])))
        if not dom.any():
            keep.append(int(docs["doc_id"].iloc[i]))
    assert sorted(out["doc_id"].tolist()) == sorted(keep)


def test_ewma_fold_order_and_first_value(ray_session, tmp_path):
    from geo_inference_ray.analytics import ewma_daily

    base = 1_700_006_400 * US   # midnight-aligned day boundary
    day_us = 86_400 * US
    # type "a": 2 events day0, 1 event day2 (gap day skipped: observed
    # days only) -> e0 = 2000, e1 = (1000 + 2000)//2 = 1500
    rows = [
        (1, base + 1, 1, "a"), (2, base + 2, 2, "a"),
        (3, base + 2 * day_us + 5, 3, "a"),
    ]
    d = _write_events(tmp_path, rows)
    out = ewma_daily(d).to_pandas().sort_values("day")
    assert list(out["ewma_fp"]) == [2000, 1500]
    assert list(np.diff(out["day"].to_numpy())) == [2]


def test_bfs_broadcast_and_join_paths_agree(ray_session, sf_dir):
    from geo_inference_ray.analytics import bfs_hops

    a = bfs_hops(sf_dir).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    # force the join path with a zero broadcast cap
    b = bfs_hops(sf_dir, broadcast_cap=0).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # seeds are hop 0, and every hop level d+1 only appears if d does
    assert (a.loc[a["hops"] == 0, "node"] % 2 == 1).all()
    present = sorted(a["hops"].unique())
    assert present == list(range(len(present)))


def test_bfs_hops_are_minimal_distances(ray_session, sf_dir):
    from geo_inference_ray.analytics import (BFS_ROUNDS,
                                             BFS_SEED_MAX_SUPPKEY,
                                             bfs_hops)

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_suppkey"])
    edges = {}
    for p, s in zip(li["l_partkey"], li["l_suppkey"]):
        a, b = 2 * int(p), 2 * int(s) + 1
        edges.setdefault(a, set()).add(b)
        edges.setdefault(b, set()).add(a)
    sup = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey"])
    frontier = {2 * int(k) + 1 for k in sup["s_suppkey"]
                if k <= BFS_SEED_MAX_SUPPKEY}
    dist = {n: 0 for n in frontier}
    for d in range(1, BFS_ROUNDS + 1):
        nxt = set()
        for n in frontier:
            for m in edges.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.add(m)
        frontier = nxt
    out = bfs_hops(sf_dir).to_pandas()
    got = dict(zip(out["node"].astype(int), out["hops"].astype(int)))
    assert got == dist


def test_pair_dp_distance_matches_reference():
    from geo_inference_ray.analytics import _pair_dp_distance

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    import random
    rng = random.Random(7)
    alpha = "abcd"
    w1, w2 = [], []
    for _ in range(300):
        w1.append("".join(rng.choice(alpha)
                          for _ in range(rng.randint(3, 12))))
        w2.append("".join(rng.choice(alpha)
                          for _ in range(rng.randint(3, 12))))
    got = _pair_dp_distance(np.asarray(w1, dtype=object),
                            np.asarray(w2, dtype=object))
    exp = [lev(a, b) for a, b in zip(w1, w2)]
    assert got.tolist() == exp


def test_typo_pairs_finds_all_dist_le2_pairs(ray_session, tmp_path):
    from geo_inference_ray.analytics import typo_pairs

    # hand-built vocabulary with known distances:
    #  cat~cut 1 (sub), cat~cart 1 (ins), cat~carts 2 (2 ins),
    #  cat~dog 3 (excluded), frog~grog 1, frog~fog 1, fog~grog 2
    words = ["cat", "cut", "cart", "carts", "dog", "frog", "grog",
             "fog"]
    t = pa.table({
        "doc_id": pa.array(range(len(words)), pa.int64()),
        "text": pa.array(words, pa.string()),
        "lang": pa.array(["en"] * len(words), pa.string()),
        "source": pa.array(["s"] * len(words), pa.string()),
        "n_chars": pa.array([len(w) for w in words], pa.int64())})
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = typo_pairs(str(d)).to_pandas()
    got = {(r.w1, r.w2): r.dist for r in out.itertuples()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    exp = {}
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            a, b = sorted([words[i], words[j]])
            dd = lev(a, b)
            if 1 <= dd <= 2:
                exp[(a, b)] = dd
    assert got == exp
    assert ("cat", "cut") in got and got[("cat", "cut")] == 1
    assert ("carts", "cat") in got and got[("carts", "cat")] == 2


def test_lang_concat_roster_is_sorted(ray_session, sf_dir):
    from geo_inference_ray.analytics import lang_concat

    out = lang_concat(sf_dir).to_pandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "lang"])
    for r in out.itertuples():
        langs = sorted(docs.loc[docs["source"] == r.source,
                                "lang"].unique())
        assert r.langs_csv == ",".join(langs)
        assert r.n_langs == len(langs)


def test_hierarchy_rollup_parent_covers_children(ray_session, sf_dir):
    from geo_inference_ray.analytics import hierarchy_rollup

    out = hierarchy_rollup(sf_dir).to_pandas().set_index("node")
    # root (node 0 at the top level) carries every line exactly once
    li_rows = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_partkey"]).shape[0]
    assert int(out.loc[0, "n_lines"]) == li_rows
    # a trie node's subtree = every part whose key has it as a
    # decimal prefix at ANY depth (1 covers 1, 10-19, 100-199, ...)
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])
    k = li["l_partkey"].to_numpy().astype(np.int64)
    line_rev = np.floor(li["l_extendedprice"].to_numpy()
                        * (1.0 - li["l_discount"].to_numpy())
                        * 100.0 + 0.5).astype(np.int64)
    from geo_inference_ray.analytics import HIER_LEVELS
    for p in [1, 2, 3]:
        mask = np.zeros(len(k), dtype=bool)
        for j in range(HIER_LEVELS):
            mask |= (k // 10 ** j) == p
        assert int(out.loc[p, "rev_cents"]) == int(line_rev[mask].sum())
        assert int(out.loc[p, "n_lines"]) == int(mask.sum())


def test_covisit_pairs_matches_bruteforce(ray_session, tmp_path):
    from geo_inference_ray.analytics import (COVISIT_MIN_DAYS,
                                             covisit_pairs)

    base = 1_700_006_400 * US
    day_us = 86_400 * US
    # users 1,2 share days 0,1,2 (pair kept, days=3); user 3 overlaps
    # user 1 on days 0,1 only (dropped); duplicate events same day
    # must not double-count
    rows, eid = [], 0
    for d in [0, 1, 2]:
        for u in [1, 2]:
            eid += 1
            rows.append((eid, base + d * day_us + eid, u, "v"))
    for d in [0, 1]:
        eid += 1
        rows.append((eid, base + d * day_us + eid, 3, "v"))
    eid += 1
    rows.append((eid, base + 5, 1, "v"))   # dup (day0, user1)
    d = _write_events(tmp_path, rows)
    out = covisit_pairs(d).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r["u1"]), int(r["u2"]), int(r["days"])) == (1, 2, 3)
    assert COVISIT_MIN_DAYS == 3


def test_cusum_shift_finds_level_change_and_breaks_ties_early(
        ray_session, tmp_path):
    from geo_inference_ray.analytics import cusum_shift

    base = 1_700_006_400 * US
    day_us = 86_400 * US
    rows, eid = [], 0
    # type "a": daily counts [1, 1, 10, 10] -> S=[1,2,12,22], n=4,
    # stat_k = |4*S_k - k*22| = [18, 36, 18, 0] -> max 36 at day 1
    for d, c in enumerate([1, 1, 10, 10]):
        for _ in range(c):
            eid += 1
            rows.append((eid, base + d * day_us + eid, 1, "a"))
    # type "b": counts [5, 5] -> stat = [0, 0]; earliest day wins
    for d in range(2):
        for _ in range(5):
            eid += 1
            rows.append((eid, base + d * day_us + eid, 1, "b"))
    d = _write_events(tmp_path, rows)
    out = cusum_shift(d).to_pandas().set_index("event_type")
    day0 = (base // US) // 86_400
    a = out.loc["a"]
    assert (int(a["shift_day"]), int(a["shift_stat"]),
            int(a["n_days"])) == (day0 + 1, 36, 4)
    b = out.loc["b"]
    assert (int(b["shift_day"]), int(b["shift_stat"]),
            int(b["n_days"])) == (day0, 0, 2)


def test_pmi_topk_scores_and_support_floor(ray_session, tmp_path):
    import ray.data as rd

    from geo_inference_ray.textops import PMI_MIN_COUNT, pmi_topk

    assert PMI_MIN_COUNT == 5
    # cb = {"a b": 6, "b a": 5, "b c": 1}; T=12, c1={a:6,b:6},
    # c2={b:6,a:5,c:1} -> pmi("a b") = floor(1000*ln(6*12/(6*6)))
    # = floor(1000*ln 2) = 693 and pmi("b a") =
    # floor(1000*ln(5*12/(6*5))) = 693 too — the tie is broken by
    # bigram ASC.  "b c" (n=1) stays under the support floor but
    # still counts toward T and the marginals.
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b a b a b a b a b a b", "b c"],
                         pa.string()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    ds = rd.read_parquet(str(d / "documents.parquet"),
                         columns=["doc_id", "text"])
    out = pmi_topk(ds).to_pandas()
    assert [(r.b, int(r.n), int(r.pmi_milli))
            for r in out.itertuples()] == [("a b", 6, 693),
                                           ("b a", 5, 693)]


def test_theilsen_lower_median_and_single_day_absent(
        ray_session, tmp_path):
    from geo_inference_ray.analytics import theilsen_slope

    base = 1_700_006_400 * US
    day_us = 86_400 * US
    rows, eid = [], 0
    # type "a": counts [1, 3, 2] on days 0,1,3 -> slopes
    # (3-1)/1=2.0, (2-1)/3=0.333.., (2-3)/2=-0.5 -> milli
    # [2000, 333, -500] sorted [-500, 333, 2000]; lower median
    # (m=3 -> 2nd) = 333
    for d, c in [(0, 1), (1, 3), (3, 2)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, base + d * day_us + eid, 1, "a"))
    # type "b": one observed day -> no pairs -> absent
    eid += 1
    rows.append((eid, base + eid, 1, "b"))
    d = _write_events(tmp_path, rows)
    out = theilsen_slope(d).to_pandas()
    assert set(out["event_type"]) == {"a"}
    r = out.iloc[0]
    assert (int(r["slope_milli"]), int(r["n_pairs"])) == (333, 3)


def test_gini_exact_integer_values(ray_session, tmp_path):
    from geo_inference_ray.analytics import gini_by_source

    # source "u": all equal -> gini 0.  source "v": [1, 3] ->
    # num = (2*1-3)*1 + (2*2-3)*3 = -1 + 3 = 2; den = 2*4 = 8 ->
    # 250000.  source "w": [0, 0, 6] -> num = (2*3-4)*6 = 12;
    # den = 3*6 = 18 -> 666666 (floor).
    lens = [("u", 5), ("u", 5), ("v", 1), ("v", 3),
            ("w", 0), ("w", 0), ("w", 6)]
    t = pa.table({
        "doc_id": pa.array(list(range(len(lens))), pa.int64()),
        "text": pa.array(["x"] * len(lens), pa.string()),
        "lang": pa.array(["en"] * len(lens), pa.string()),
        "source": pa.array([s for s, _ in lens], pa.string()),
        "n_chars": pa.array([n for _, n in lens], pa.int64()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = gini_by_source(str(d)).to_pandas().set_index("source")
    assert int(out.loc["u", "gini_micro"]) == 0
    assert int(out.loc["v", "gini_micro"]) == 250_000
    assert int(out.loc["w", "gini_micro"]) == 666_666
    assert int(out.loc["w", "n_docs"]) == 3


def test_keyness_support_floor_and_b_zero_term(ray_session, tmp_path):
    import ray.data as rd

    from geo_inference_ray.textops import (KEYNESS_MIN_COUNT,
                                           keyness_topk)

    assert KEYNESS_MIN_COUNT == 5
    # source A: "only" x5 (exclusive to A -> b=0 term exercised),
    # "both" x5; source B: "both" x5, "rare" x4 (under the floor).
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "source": pa.array(["A", "B"], pa.string()),
        "text": pa.array([" ".join(["only"] * 5 + ["both"] * 5),
                          " ".join(["both"] * 5 + ["rare"] * 4)],
                         pa.string()),
    })
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    ds = rd.read_parquet(str(d / "documents.parquet"),
                         columns=["source", "text"])
    out = keyness_topk(ds).to_pandas()
    # "rare" (a=4) filtered; "only" in A has b=0: N=19, NA=10,
    # E1 = 5*10/19 -> G2 = 2*5*ln(19/10) = 6.418.. -> 6418
    keys = {(r.source, r.token): int(r.g2_milli)
            for r in out.itertuples()}
    assert ("B", "rare") not in keys
    assert keys[("A", "only")] == int(
        np.floor(1000.0 * (2.0 * (5.0 * np.log(5.0 / ((5.0 * 10.0) / 19.0))))))
    # "both" is evenly split vs expectation in B (a=5, b=5, na=9):
    assert ("B", "both") in keys


def test_fano_factor_exact_micro(ray_session, tmp_path):
    from geo_inference_ray.analytics import fano_factor

    base = 1_700_006_400 * US
    day_us = 86_400 * US
    rows, eid = [], 0
    # type "a": daily counts [1, 3] -> n=2, s1=4, s2=10 ->
    # (1e6 * (2*10 - 16)) // (2*4) = 500000
    for d, c in [(0, 1), (1, 3)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, base + d * day_us + eid, 1, "a"))
    d = _write_events(tmp_path, rows)
    out = fano_factor(d).to_pandas()
    assert (int(out["n_days"].iloc[0]),
            int(out["fano_micro"].iloc[0])) == (2, 500_000)


def test_lexical_entropy_orderfree_quantization(ray_session, tmp_path):
    import ray.data as rd

    from geo_inference_ray.textops import lexical_entropy

    # "x x y": tf = {x: 2, y: 1} -> ent = 2*floor(1000*ln 2) + 1*0
    # = 1386; n_tokens 3, n_distinct 2
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "text": pa.array(["x x y"], pa.string())})
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = lexical_entropy(
        rd.read_parquet(str(d / "documents.parquet"))).to_pandas()
    r = out.iloc[0]
    assert (int(r["n_tokens"]), int(r["n_distinct"]),
            int(r["ent_term_milli"])) == (3, 2, 1386)


def test_moran_i_perfect_anticorrelation(ray_session):
    import ray.data as rd

    from geo_inference_ray.geoext import moran_i

    # two adjacent populated cells (offset +1 is a ring-1 neighbor),
    # counts 2 and 1: N=2, S=3, z = [1, -1]; each sees only the other
    # -> num = -2, w = 2, den = 2 -> I = (N/W)*num/den = -1
    ds = rd.from_arrow(pa.table(
        {"hex7": pa.array([100, 100, 101], pa.int64())}))
    out = moran_i(ds).to_pandas().iloc[0]
    assert (int(out["n_cells"]), int(out["w_pairs"]),
            int(out["num"]), int(out["den"])) == (2, 2, -2, 2)


def test_lisa_quadrant_labels(ray_session):
    import ray.data as rd

    from geo_inference_ray.geoext import lisa_cells

    # cells 100 (x=2) and 101 (x=1) adjacent: z = [1, -1]; cell 100
    # sees zn=-1 -> HL (hot outlier), cell 101 sees zn=1 -> LH
    ds = rd.from_arrow(pa.table(
        {"hex7": pa.array([100, 100, 101], pa.int64())}))
    out = lisa_cells(ds).to_pandas().set_index("hex7")
    assert out.loc[100, "label"] == "HL"
    assert out.loc[101, "label"] == "LH"
    assert int(out.loc[100, "z"]) == 1
    assert int(out.loc[100, "zn"]) == -1
    assert int(out.loc[100, "w"]) == 1


def test_zipf_fit_hand_values_and_tie_independence(
        ray_session, tmp_path):
    import ray.data as rd

    from geo_inference_ray.textops import zipf_fit

    # freqs a=2, b=2, c=1 -> ranks {1,2} for the f=2 run (assignment
    # within the tie is irrelevant to the sums), 3 for c.
    # lx = [0, 693, 1098], ly = [693, 693, 0]
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["a a b b c"], pa.string())})
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = zipf_fit(rd.read_parquet(
        str(d / "documents.parquet"))).to_pandas().iloc[0]
    assert (int(out["n_vocab"]), int(out["sx"]), int(out["sy"]),
            int(out["sxy"]), int(out["sxx"])) == \
        (3, 1791, 1386, 480249, 1685853)


def test_acf_lag1_gap_breaks_adjacency(ray_session, tmp_path):
    from geo_inference_ray.analytics import acf_lag1

    base = 1_700_006_400 * US
    day_us = 86_400 * US
    rows, eid = [], 0
    # counts [2, 3] on days 0,1 (adjacent) and [5] on day 3 (gap) ->
    # n_days=3, s1=10, s2=38, n_adj=1, sxy=2*3=6
    for d, c in [(0, 2), (1, 3), (3, 5)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, base + d * day_us + eid, 1, "a"))
    d = _write_events(tmp_path, rows)
    out = acf_lag1(d).to_pandas().iloc[0]
    assert (int(out["n_days"]), int(out["s1"]), int(out["s2"]),
            int(out["n_adj"]), int(out["sxy"])) == (3, 10, 38, 1, 6)


def test_mannwhitney_u2_with_ties(ray_session, tmp_path):
    import ray.data as rd

    from geo_inference_ray.textops import mannwhitney_u

    # A: [1, 2]; B: [2, 3].  u2 counts pairs the source's sample
    # EXCEEDS the rest (x2) plus ties (x1).  A beats B in 0 pairs,
    # ties once ((2,2)) -> u2_A = 1; B beats A in 3 pairs + 1 tie
    # -> u2_B = 7; u2_A + u2_B = 2*na*nb = 8.
    t = pa.table({
        "source": pa.array(["A", "A", "B", "B"], pa.string()),
        "n_chars": pa.array([1, 2, 2, 3], pa.int64())})
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    out = mannwhitney_u(rd.read_parquet(
        str(d / "documents.parquet"))).to_pandas().set_index("source")
    assert (int(out.loc["A", "n_src"]), int(out.loc["A", "u2"])) == (2, 1)
    assert (int(out.loc["B", "n_src"]), int(out.loc["B", "u2"])) == (2, 7)
    # symmetry: u2_A + u2_B == 2 * na * nb
    assert int(out.loc["A", "u2"]) + int(out.loc["B", "u2"]) == 8


def test_peak_concurrency_window_edges_and_ghost_buckets(
        ray_session, tmp_path):
    from geo_inference_ray.analytics import peak_concurrency

    base = 1_700_006_400 * US
    m = 60 * US
    # type "a": starts at 0, 10min, 40min.  conc(10min) = 2;
    # conc(40min) = 1 because the 10min event sits EXACTLY at the
    # window's open edge (strict >).  type "b": 25min and 35min fall
    # in DIFFERENT 30-min buckets, the window at 35min spans both ->
    # exercises the ghost scatter: conc = 2 at 35min.
    rows = [(1, base, 1, "a"), (2, base + 10 * m, 1, "a"),
            (3, base + 40 * m, 1, "a"),
            (4, base + 25 * m, 1, "b"), (5, base + 35 * m, 1, "b")]
    d = _write_events(tmp_path, rows)
    out = peak_concurrency(d).to_pandas().set_index("event_type")
    assert (int(out.loc["a", "conc"]), int(out.loc["a", "at_us"])) \
        == (2, base + 10 * m)
    assert (int(out.loc["b", "conc"]), int(out.loc["b", "at_us"])) \
        == (2, base + 35 * m)
