"""Tests for the late-round-4 TPC-H analog batch (Q6/Q12/Q21/Q16 and
the Q8/Q9 multi-dimension joins): every pipeline is checked against its
registered DuckDB oracle SQL (the exact mirror the driver runs), plus
semantics tests for the shapes the oracle can't pin (empty windows,
path seams)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


@pytest.mark.parametrize("name", ["q6_forecast", "q12_late_priority",
                                  "q8_share", "q9_profit"])
def test_matches_registered_oracle(ray_session, sf_dir, duck, name):
    import __ray_entry__ as entry

    got = entry.queries()[name](sf_dir)
    if not isinstance(got, (pd.DataFrame,)):
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
    exp = duck.sql(entry.oracle_sql()[name]).df()
    assert len(got) == len(exp) > 0
    got, exp = _canon(got), _canon(exp)
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        assert (a == b).all(), c


def test_q6_empty_window_is_one_zero_row(ray_session, tmp_path):
    """A ship-date window with no qualifying lines must still return
    the single aggregate row (zero revenue, zero lines), matching the
    SQL SUM-over-empty convention only in shape — the engine keeps the
    row because every batch emits a partial."""
    from geo_inference_ray import relational

    d = tmp_path / "q6"
    d.mkdir()
    pq.write_table(pa.table({
        "l_shipdate": pa.array(
            np.array([0, 86_400_000_000], "datetime64[us]")),
        "l_discount": pa.array([0.06, 0.06]),
        "l_quantity": pa.array([10.0, 10.0]),
        "l_extendedprice": pa.array([100.0, 200.0])}),
        d / "lineitem.parquet")
    out = relational.q6_forecast(str(d)).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "revenue_cents"] == 0
    assert out.loc[0, "n_lines"] == 0


def test_q12_counts_partition_by_priority(ray_session, sf_dir):
    """high_count + low_count per status must equal the plain late-line
    count, and only the two line statuses may appear."""
    import duckdb

    from geo_inference_ray import relational

    out = relational.q12_late_priority(sf_dir).to_pandas()
    assert set(out["l_linestatus"]) <= {"F", "O"}
    totals = duckdb.sql(f"""
        SELECT l.l_linestatus, COUNT(*) AS n
        FROM read_parquet('{sf_dir}/lineitem.parquet') l
        JOIN read_parquet('{sf_dir}/orders.parquet') o
          ON o.o_orderkey = l.l_orderkey
        WHERE epoch_us(l.l_shipdate) >= {relational.Q12_LO_US}
          AND epoch_us(l.l_shipdate) < {relational.Q12_HI_US}
          AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate)
                                       + {relational.Q12_LATE_US}
        GROUP BY 1""").df().set_index("l_linestatus")["n"]
    for _, r in out.iterrows():
        assert r["high_count"] + r["low_count"] == \
            totals[r["l_linestatus"]]


def test_q8_share_bounds_and_seam(ray_session, sf_dir, monkeypatch):
    """focus_cents <= total_cents, the share stays in (0, 1), and the
    broadcast-probe and hash-join dimension paths agree exactly."""
    from geo_inference_ray import relational

    broadcast = _canon(relational.q8_share(sf_dir).to_pandas())
    assert (broadcast["focus_cents"] <= broadcast["total_cents"]).all()
    assert (broadcast["total_cents"] > 0).all()
    # the focus nation can legitimately supply nothing at tiny scales,
    # so the lower bound is inclusive
    assert broadcast["mkt_share"].between(0, 1, inclusive="left").all()
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    joined = _canon(relational.q8_share(sf_dir).to_pandas())
    pd.testing.assert_frame_equal(broadcast, joined)


def test_q9_profit_integer_exact_seam(ray_session, sf_dir,
                                      monkeypatch):
    """The fused (match ? retail_cents : -1) broadcast payload and the
    join fallback must produce identical fifth-cent sums."""
    from geo_inference_ray import relational

    broadcast = _canon(relational.q9_profit(sf_dir).to_pandas())
    assert len(broadcast) > 0
    assert broadcast["n_lines"].sum() > 0
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    joined = _canon(relational.q9_profit(sf_dir).to_pandas())
    pd.testing.assert_frame_equal(broadcast, joined)


@pytest.mark.parametrize("name", ["q21_waiting", "q16_supplier_cnt"])
def test_q21_q16_match_registered_oracle(ray_session, sf_dir, duck,
                                         name):
    import __ray_entry__ as entry

    got = entry.queries()[name](sf_dir).to_pandas()
    exp = duck.sql(entry.oracle_sql()[name]).df()
    assert len(got) == len(exp) > 0
    got, exp = _canon(got), _canon(exp)
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_q21_sole_late_semantics(ray_session, tmp_path):
    """Hand-built corpus: order 1 has two suppliers with exactly one
    late -> counted; order 2 has two late suppliers -> nobody counted;
    order 3 is single-supplier late -> not counted; order 4 is not
    finished -> ignored."""
    from geo_inference_ray import relational

    d = tmp_path / "q21"
    d.mkdir()
    day = 86_400_000_000
    t0 = np.int64(0)

    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array(np.full(4, t0, "datetime64[us]")),
        "o_orderstatus": pa.array(["F", "F", "F", "O"])})
    late_us = relational.Q21_LATE_US + day
    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 4], pa.int64()),
        "l_suppkey": pa.array([10, 11, 12, 13, 14, 15, 16], pa.int64()),
        "l_shipdate": pa.array(np.array(
            [late_us, day, late_us, late_us, late_us, late_us, day],
            "datetime64[us]"))})
    sup = pa.table({
        "s_suppkey": pa.array([10, 11, 12, 13, 14, 15, 16], pa.int64()),
        "s_name": pa.array([f"S{k}" for k in range(10, 17)])})
    pq.write_table(orders, d / "orders.parquet")
    pq.write_table(li, d / "lineitem.parquet")
    pq.write_table(sup, d / "supplier.parquet")

    out = relational.q21_waiting(str(d)).to_pandas()
    assert out.to_dict("records") == [{"s_name": "S10", "numwait": 1}]


def test_q16_exclusion_seam(ray_session, sf_dir, monkeypatch):
    """The supplier-exclusion broadcast flag and its hash-join fallback
    must produce identical distinct counts."""
    from geo_inference_ray import relational

    broadcast = _canon(relational.q16_supplier_cnt(sf_dir).to_pandas())
    assert (broadcast["supplier_cnt"] >= 1).all()
    assert (broadcast["p_brand"] != relational.Q16_EXCL_BRAND).all()
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    joined = _canon(relational.q16_supplier_cnt(sf_dir).to_pandas())
    pd.testing.assert_frame_equal(broadcast, joined)


def test_ttr_stats_matches_oracle_and_edge_cases(ray_session, sf_dir,
                                                 duck, tmp_path):
    import __ray_entry__ as entry
    from geo_inference_ray import textops

    got = _canon(entry.queries()["ttr_stats"](sf_dir).to_pandas())
    exp = _canon(duck.sql(entry.oracle_sql()["ttr_stats"]).df())
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (got["n_distinct"] <= got["n_tokens"]).all()
    assert got["ttr_permille"].between(0, 1000).all()

    # edge cases: empty text (one empty token), all-repeat, all-unique
    d = tmp_path / "ttr"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["", "a a a a", "x y z"])}),
        d / "documents.parquet")
    out = textops.ttr_stats(str(d)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1].tolist() == [1, 1, 1000]
    assert out.loc[2].tolist() == [4, 1, 250]
    assert out.loc[3].tolist() == [3, 3, 1000]


@pytest.mark.parametrize("name", ["q11_important_parts",
                                  "q20_excess_share"])
def test_q11_q20_match_registered_oracle(ray_session, sf_dir, duck,
                                         name):
    import __ray_entry__ as entry

    got = entry.queries()[name](sf_dir).to_pandas()
    exp = duck.sql(entry.oracle_sql()[name]).df()
    assert len(got) == len(exp) > 0
    got, exp = _canon(got), _canon(exp)
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_q11_empty_focus_nation(ray_session, tmp_path):
    """No lines from the focus nation -> empty result, no crash (the
    None-total guard)."""
    from geo_inference_ray import relational

    d = tmp_path / "q11"
    d.mkdir()
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 3], pa.int64()),
        "n_name": pa.array(["NATION_0", "NATION_3"])}),
        d / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_nationkey": pa.array([0], pa.int64())}),
        d / "supplier.parquet")
    pq.write_table(pa.table({
        "l_partkey": pa.array([7], pa.int64()),
        "l_suppkey": pa.array([1], pa.int64()),
        "l_extendedprice": pa.array([100.0]),
        "l_discount": pa.array([0.0])}),
        d / "lineitem.parquet")
    out = relational.q11_important_parts(str(d))
    # assert on the Dataset schema: Ray's to_pandas() drops column
    # names for zero-row datasets
    assert sorted(out.schema().names) == ["p_partkey", "value_cents"]
    assert out.count() == 0


def test_q20_share_semantics(ray_session, sf_dir):
    """Every winning supplier must hold > 1/5 of some matched part's
    windowed quantity — re-derive one winner's share from the raw
    parquet to pin the join direction."""
    import duckdb

    from geo_inference_ray import relational

    out = relational.q20_excess_share(sf_dir).to_pandas()
    assert len(out) > 0 and (out["n_parts"] >= 1).all()
    check = duckdb.sql(f"""
        WITH pairs AS (
          SELECT l.l_partkey, l.l_suppkey,
                 CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
          FROM read_parquet('{sf_dir}/lineitem.parquet') l
          JOIN read_parquet('{sf_dir}/part.parquet') p
            ON p.p_partkey = l.l_partkey
           AND p.p_name LIKE '%{relational.Q20_NEEDLE}%'
          WHERE epoch_us(l.l_shipdate) >= {relational.Q20_LO_US}
            AND epoch_us(l.l_shipdate) < {relational.Q20_HI_US}
          GROUP BY 1, 2),
        tot AS (SELECT l_partkey, SUM(q) AS tq FROM pairs GROUP BY 1)
        SELECT COUNT(DISTINCT pairs.l_suppkey) AS n
        FROM pairs JOIN tot USING (l_partkey)
        WHERE pairs.q * {relational.Q20_SHARE_MUL} > tot.tq
        """).df()
    assert len(out) == int(check.loc[0, "n"])
