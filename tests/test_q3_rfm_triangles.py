"""Tests for the TPC-H-Q3 analog (3-way join + top-k), RFM NTILE
scoring (range-partitioned exact rank), and per-node triangle counts
(compact-forward wedges + closure probe)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_ntile_formula_matches_sql_distribution():
    """First (n % k) buckets get ceil(n/k) rows, rest floor(n/k)."""
    from geo_inference_ray.relational import _ntile

    for n in range(1, 30):
        for k in (2, 3, 4, 7):
            r = np.arange(1, n + 1, dtype=np.int64)
            t = _ntile(r, n, k)
            q, m = divmod(n, k)
            sizes = [q + 1] * m + [q] * (k - m)
            sizes = [s for s in sizes if s > 0]
            got = [int((t == b).sum()) for b in
                   range(1, max(t) + 1)]
            assert got == sizes, (n, k, got, sizes)
            assert (np.diff(t) >= 0).all()


def test_rfm_scores_matches_single_machine_rank(ray_session, sf_dir):
    from geo_inference_ray.relational import RFM_TILES, _ntile, \
        rfm_scores

    out = rfm_scores(sf_dir).to_pandas() \
        .sort_values("o_custkey").reset_index(drop=True)
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])
    o["cents"] = np.round(o["o_totalprice"].to_numpy()
                          * 100).astype(np.int64)
    o["us"] = o["o_orderdate"].astype("int64")
    cust = o.groupby("o_custkey", as_index=False).agg(
        r_us=("us", "max"), f=("us", "size"), m_cents=("cents", "sum"))
    n = len(cust)
    assert len(out) == n
    for metric, col in (("r_us", "r_score"), ("f", "f_score"),
                        ("m_cents", "m_score")):
        srt = cust.sort_values([metric, "o_custkey"],
                               kind="stable").reset_index(drop=True)
        rank = np.arange(1, n + 1, dtype=np.int64)
        exp = pd.Series(_ntile(rank, n, RFM_TILES),
                        index=srt["o_custkey"]).sort_index()
        got = out.set_index("o_custkey")[col].sort_index()
        assert (got.to_numpy() == exp.to_numpy()).all(), col
    # frequency has heavy tie runs — the pass above proves tie-run
    # co-location across partitions


def _write_lineitem(tmp_path, part_suppliers):
    rows = []
    for p, sups in part_suppliers.items():
        for s in sups:
            rows.append((p, s))
    n = len(rows)
    t = pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([1.0] * n),
        "l_extendedprice": pa.array([1.0] * n),
        "l_discount": pa.array([0.0] * n),
        "l_tax": pa.array([0.0] * n),
        "l_returnflag": pa.array(["N"] * n),
        "l_linestatus": pa.array(["O"] * n),
        "l_shipdate": pa.array([0] * n, pa.timestamp("us")),
    })
    d = tmp_path / "li"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")
    return str(d)


def test_triangles_golden_graph(ray_session, tmp_path):
    """parts: {1,2,3} -> triangle; {3,4} -> edge only; 5 isolated.
    Duplicate (part, supplier) rows must not create extra edges."""
    from geo_inference_ray.graph import triangles

    d = _write_lineitem(tmp_path, {
        10: [1, 2, 3, 1, 2],     # dup rows collapse
        11: [3, 4],
        12: [5],
    })
    out = triangles(d).to_pandas().sort_values("s_suppkey") \
        .reset_index(drop=True)
    assert list(out["s_suppkey"]) == [1, 2, 3]
    assert list(out["n_triangles"]) == [1, 1, 1]


def test_triangles_shared_edge_two_triangles(ray_session, tmp_path):
    """K4 minus one edge: suppliers {1,2,3} and {2,3,4} each form a
    triangle sharing edge (2,3)."""
    from geo_inference_ray.graph import triangles

    d = _write_lineitem(tmp_path, {10: [1, 2, 3], 11: [2, 3, 4]})
    out = triangles(d).to_pandas().set_index("s_suppkey") \
        ["n_triangles"].sort_index()
    assert dict(out) == {1: 1, 2: 2, 3: 2, 4: 1}


def test_q5_broadcast_and_join_paths_agree(ray_session, sf_dir,
                                           monkeypatch):
    """The dim-map broadcast probe and the hash-join fallback must
    produce identical star-join results."""
    from geo_inference_ray import relational

    def run():
        return relational.q5_local_supply(sf_dir).to_pandas() \
            .sort_values("n_name").reset_index(drop=True)

    broadcast = run()
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    joined = run()
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(broadcast, joined)


def test_q3_shipping_matches_bruteforce(ray_session, sf_dir):
    from geo_inference_ray.relational import (Q3_CUTOFF_US, Q3_SEGMENT,
                                              Q3_TOPK, q3_shipping)

    out = q3_shipping(sf_dir).to_pandas()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    li = li[li["l_shipdate"].astype("int64") > Q3_CUTOFF_US]
    rev = np.round(li["l_extendedprice"].to_numpy()
                   * (1.0 - li["l_discount"].to_numpy())
                   * 100.0).astype(np.int64)
    li = li.assign(rev=rev).groupby("l_orderkey", as_index=False) \
        .agg(revenue_cents=("rev", "sum"))
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o["o_orderdate"].astype("int64") < Q3_CUTOFF_US]
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    c = c[c["c_mktsegment"] == Q3_SEGMENT]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey") \
        .merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j.sort_values(["revenue_cents", "l_orderkey"],
                      ascending=[False, True]).head(Q3_TOPK)
    exp = j[["l_orderkey", "o_orderdate", "o_orderpriority",
             "revenue_cents"]].reset_index(drop=True)
    got = out.sort_values(["revenue_cents", "l_orderkey"],
                          ascending=[False, True]) \
        .reset_index(drop=True)[exp.columns.tolist()]
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
