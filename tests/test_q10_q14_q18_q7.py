"""Tests for the TPC-H Q10/Q14/Q18/Q7 analogs: each engine pipeline is
checked against its registered DuckDB oracle SQL (the exact mirror the
driver runs), plus path-forcing tests for the broadcast/join seams."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


@pytest.mark.parametrize("name", ["q10_returned", "q14_promo",
                                  "q18_big_orders", "q7_volume"])
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


def test_q14_broadcast_and_join_paths_agree(ray_session, sf_dir,
                                            monkeypatch):
    """The derived (partkey, is_promo) broadcast probe and the hash-join
    fallback must produce the identical single-row ratio."""
    from geo_inference_ray import relational

    def run():
        return relational.q14_promo(sf_dir).to_pandas()

    broadcast = run()
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    joined = run()
    pd.testing.assert_frame_equal(broadcast, joined)
    assert 0 < broadcast.loc[0, "promo_milli"] < 1000


def test_q7_volume_excludes_local_pairs(ray_session, sf_dir):
    """Every output pair must have supp_nation != cust_nation, and the
    total revenue must complement q5's local-supply revenue over the
    shared [1996, 1997) window."""
    from geo_inference_ray import relational

    out = relational.q7_volume(sf_dir).to_pandas()
    assert len(out) > 0
    assert (out["supp_nation"] != out["cust_nation"]).all()
    assert out["yr"].between(1996, 1997).all()


def test_q18_having_threshold_boundary(ray_session, tmp_path):
    """Orders at exactly Q18_QTY_MIN are excluded (strict >)."""
    from geo_inference_ray.relational import Q18_QTY_MIN, q18_big_orders

    d = tmp_path / "q18"
    d.mkdir()
    # order 1: sum == threshold (excluded); order 2: threshold+1 (kept)
    qty_at = [25.0] * (Q18_QTY_MIN // 25)
    qty_over = qty_at + [1.0]
    n1, n2 = len(qty_at), len(qty_over)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1] * n1 + [2] * n2, pa.int64()),
        "l_quantity": pa.array(qty_at + qty_over),
    }), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
        "o_orderdate": pa.array([0, 0], pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 200.0]),
    }), d / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_name": pa.array(["a", "b"]),
    }), d / "customer.parquet")
    out = q18_big_orders(str(d)).to_pandas()
    assert out["o_orderkey"].tolist() == [2]
    assert out["sum_qty"].tolist() == [Q18_QTY_MIN + 1]


@pytest.mark.parametrize("name", ["q13_count_dist", "q17_small_qty",
                                  "q22_idle_rich"])
def test_q13_q17_q22_match_registered_oracle(ray_session, sf_dir, duck,
                                             name):
    import __ray_entry__ as entry

    got = entry.queries()[name](sf_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    exp = duck.sql(entry.oracle_sql()[name]).df()
    assert len(got) == len(exp) > 0
    got, exp = _canon(got), _canon(exp)
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_q13_includes_zero_order_customers(ray_session, tmp_path):
    from geo_inference_ray.relational import q13_count_dist

    d = tmp_path / "q13"
    d.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64())}),
        d / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64())}),
        d / "orders.parquet")
    out = q13_count_dist(str(d)).to_pandas() \
        .sort_values("c_count").reset_index(drop=True)
    assert out["c_count"].tolist() == [0, 1, 2]
    assert out["custdist"].tolist() == [1, 1, 1]


def test_q22_broadcast_and_anti_join_paths_agree(ray_session, sf_dir,
                                                 monkeypatch):
    from geo_inference_ray import relational

    def run():
        return relational.q22_idle_rich(sf_dir).to_pandas() \
            .sort_values("c_nationkey").reset_index(drop=True)

    broadcast = run()
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    anti = run()
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(broadcast, anti)


def test_q17_exact_fifth_average_excluded(ray_session, tmp_path):
    """A line at exactly tq/(5*cnt) must NOT count (strict <)."""
    from geo_inference_ray.relational import q17_small_qty

    d = tmp_path / "q17"
    d.mkdir()
    # part 1: quantities [1, 9] -> tq=10, cnt=2; q=1 gives
    # 1*5*2 = 10 which is NOT < 10 -> excluded (exact boundary).
    # part 2: [1, 14] -> tq=15, cnt=2; 1*5*2 = 10 < 15 -> included.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_quantity": pa.array([1.0, 9.0, 1.0, 14.0]),
        "l_extendedprice": pa.array([10.0] * 4),
        "l_discount": pa.array([0.0] * 4)}), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#1"])}),
        d / "part.parquet")
    out = q17_small_qty(str(d)).to_pandas()
    assert out.loc[0, "n_lines"] == 1
    assert out.loc[0, "rev_cents"] == 1000


def test_debounce_chained_suppression(ray_session, tmp_path):
    """The case plain window functions get wrong: an event inside the
    window of a SUPPRESSED event (but outside the window of the last
    KEPT one) must be kept."""
    from geo_inference_ray.relational import debounce

    d = tmp_path / "db"
    d.mkdir()
    # user 1, window 10: ts 0 keep; 8 drop (gap 8); 12 keep (gap from
    # last KEPT = 12 > 10, even though gap from the dropped 8 is 4);
    # 22 drop (gap 10, not strictly >); 23 keep.
    ts = [0, 8, 12, 22, 23]
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([1] * 5, pa.int64()),
        "ts": pa.array([t * 1_000_000 for t in ts],
                       pa.timestamp("us"))}), d / "events.parquet")
    out = debounce(str(d), window_us=10_000_000).to_pandas() \
        .sort_values("event_id")
    assert out["event_id"].tolist() == [0, 2, 4]


def test_debounce_matches_registered_oracle(ray_session, sf_dir, duck):
    import __ray_entry__ as entry

    got = entry.queries()["debounce"](sf_dir).to_pandas()
    exp = duck.sql(entry.oracle_sql()["debounce"]).df()
    assert len(got) == len(exp) > 0
    got, exp = _canon(got), _canon(exp)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_q15_ties_all_returned(ray_session, tmp_path):
    """Two suppliers at the exact same max revenue both win."""
    from geo_inference_ray.relational import Q15_LO_US, q15_top_supplier

    d = tmp_path / "q15"
    d.mkdir()
    ts = pa.array([Q15_LO_US] * 4, pa.timestamp("us"))
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 3, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 100.0, 40.0, 60.0]),
        "l_discount": pa.array([0.0] * 4),
        "l_shipdate": ts}), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["a", "b", "c"])}),
        d / "supplier.parquet")
    out = q15_top_supplier(str(d)).to_pandas() \
        .sort_values("s_suppkey").reset_index(drop=True)
    assert out["s_suppkey"].tolist() == [1, 2, 3]
    assert (out["revenue_cents"] == 10000).all()


def test_q15_matches_registered_oracle(ray_session, sf_dir, duck):
    import __ray_entry__ as entry

    got = entry.queries()["q15_top_supplier"](sf_dir).to_pandas()
    exp = duck.sql(entry.oracle_sql()["q15_top_supplier"]).df()
    assert len(got) == len(exp) > 0
    got, exp = _canon(got), _canon(exp)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_q19_broadcast_and_join_paths_agree(ray_session, sf_dir,
                                            monkeypatch):
    from geo_inference_ray import relational

    def run():
        return relational.q19_disjunctive(sf_dir).to_pandas()

    broadcast = run()
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    joined = run()
    pd.testing.assert_frame_equal(broadcast, joined)
    assert broadcast.loc[0, "n_lines"] > 0


def test_q19_matches_registered_oracle(ray_session, sf_dir, duck):
    import __ray_entry__ as entry

    got = entry.queries()["q19_disjunctive"](sf_dir).to_pandas()
    exp = duck.sql(entry.oracle_sql()["q19_disjunctive"]).df()
    got, exp = _canon(got), _canon(exp)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_kl_by_source_zero_for_identical_mix(ray_session, tmp_path):
    """Two sources with the identical token distribution have exactly
    zero KL numerator (arg = 1 -> ln = 0 -> floor = 0, no float
    slack); a skewed source scores positive."""
    import ray.data as rd

    from geo_inference_ray.textops import kl_by_source

    d = tmp_path / "kl"
    d.mkdir()
    pq.write_table(pa.table({
        "source": pa.array(["a", "a", "b", "b"]),
        "text": pa.array(["x x y", "z", "x x y", "z"])}),
        d / "documents.parquet")
    out = kl_by_source(rd.read_parquet(str(d / "documents.parquet"))) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    assert out["kl_numer_milli"].tolist() == [0, 0]
    assert out["n_tokens"].tolist() == [4, 4]

    pq.write_table(pa.table({
        "source": pa.array(["a", "b"]),
        "text": pa.array(["x x x x", "y"])}),
        d / "documents.parquet")
    out2 = kl_by_source(rd.read_parquet(str(d / "documents.parquet"))) \
        .to_pandas().sort_values("source").reset_index(drop=True)
    assert (out2["kl_numer_milli"] > 0).all()


def test_kl_by_source_matches_registered_oracle(ray_session, sf_dir,
                                                duck):
    import __ray_entry__ as entry

    got = entry.queries()["kl_by_source"](sf_dir).to_pandas()
    exp = duck.sql(entry.oracle_sql()["kl_by_source"]).df()
    assert len(got) == len(exp) > 0
    got, exp = _canon(got), _canon(exp)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_jsonl_round_trip_lossless(ray_session, sf_dir):
    """parquet -> JSONL -> Ray JSON reader must reproduce every value
    (unicode text included) and the int64 dtypes."""
    import pyarrow.parquet as pq_mod

    from geo_inference_ray.sources import jsonl_documents

    got = jsonl_documents(sf_dir).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp = pq_mod.read_table(f"{sf_dir}/documents.parquet").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    for c in exp.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert got["doc_id"].dtype == exp["doc_id"].dtype


def test_user_entropy_uniform_and_single_type(ray_session, tmp_path):
    """Single-type user scores exactly 0 (ln(1) = 0, no float slack);
    a uniform two-type user scores n * floor(1000*ln(2))."""
    import numpy as np

    from geo_inference_ray.relational import user_entropy

    d = tmp_path / "ue"
    d.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array([1] * 4 + [2] * 4, pa.int64()),
        "event_type": pa.array(["a"] * 4 + ["a", "a", "b", "b"]),
    }), d / "events.parquet")
    out = user_entropy(str(d)).to_pandas().set_index("user_id") \
        .sort_index()
    assert out.loc[1, "entropy_numer_milli"] == 0
    expected = 4 * int(np.floor(-1000.0 * np.log(0.5)))
    assert out.loc[2, "entropy_numer_milli"] == expected
    assert out["n_events"].tolist() == [4, 4]


def test_q2_ties_and_cross_batch_dedup(ray_session, tmp_path):
    """Two suppliers at the same min balance both win; a pair seen in
    many lineitem rows (cross-batch duplicates) emits once."""
    from geo_inference_ray.relational import q2_min_cost_supplier

    d = tmp_path / "q2"
    d.mkdir()
    pq.write_table(pa.table({
        "l_partkey": pa.array([1] * 6 + [2], pa.int64()),
        "l_suppkey": pa.array([10, 10, 10, 11, 12, 11, 10], pa.int64()),
    }), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_acctbal": pa.array([5.0, 5.0, 9.0])}),
        d / "supplier.parquet")
    out = q2_min_cost_supplier(str(d)).to_pandas() \
        .sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)
    assert out[["l_partkey", "l_suppkey"]].values.tolist() == \
        [[1, 10], [1, 11], [2, 10]]
    assert (out["acctbal_cents"] == 500).all()


def test_q2_matches_registered_oracle(ray_session, sf_dir, duck):
    import __ray_entry__ as entry

    got = entry.queries()["q2_min_cost"](sf_dir).to_pandas()
    exp = duck.sql(entry.oracle_sql()["q2_min_cost"]).df()
    assert len(got) == len(exp) > 0
    got, exp = _canon(got), _canon(exp)
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_q2_broadcast_and_join_paths_agree(ray_session, sf_dir,
                                           monkeypatch):
    from geo_inference_ray import relational

    def run():
        return relational.q2_min_cost_supplier(sf_dir).to_pandas() \
            .sort_values(["l_partkey", "l_suppkey"]) \
            .reset_index(drop=True)

    broadcast = run()
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    joined = run()
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(broadcast, joined)


def test_centroid_by_label_known_vectors(ray_session, tmp_path):
    """Hand-built vectors: component-wise floored-milli sums and
    counts; negative components floor AWAY from zero."""
    from geo_inference_ray.ann import centroid_by_label

    d = tmp_path / "cb"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "label": pa.array([7, 7, 8], pa.int32()),
        "embedding": pa.array([[0.5, -0.0015], [0.25, 0.001],
                               [1.0, 2.0]],
                              pa.list_(pa.float32())),
    }), d / "embeddings.parquet")
    out = centroid_by_label(str(d)).to_pandas() \
        .sort_values(["label", "dim_idx"]).reset_index(drop=True)
    # label 7, dim 0: 500 + 250 = 750; dim 1: floor(float32(-0.0015)
    # * 1000 = -1.4999...) = -2 plus floor(float32(0.001) * 1000 =
    # 1.000000047) = 1 -> sum -1 (the float32 widening is part of the
    # contract — DuckDB computes the identical values)
    assert out["label"].tolist() == [7, 7, 8, 8]
    assert out.loc[0, "sum_milli"] == 750
    assert out.loc[1, "sum_milli"] == -1
    assert out.loc[2, "sum_milli"] == 1000
    assert out.loc[3, "sum_milli"] == 2000
    assert out["n"].tolist() == [2, 2, 1, 1]


def test_llm_prep_composite_invariants(ray_session, sf_dir, duck,
                                       monkeypatch):
    """The composite chain matches its chained oracle on BOTH the
    winner-broadcast and semi-join paths, and each stage actually
    bites (dedup drops docs; the median floor drops more)."""
    import __ray_entry__ as entry
    from geo_inference_ray import textops

    exp = duck.sql(entry.oracle_sql()["llm_prep"]).df()

    def run():
        return textops.llm_prep(sf_dir).to_pandas()

    got = run()
    assert len(got) == len(exp) > 0
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        assert (g[c].to_numpy() == e[c].to_numpy()).all(), c
    # stage bite: fewer surviving docs than raw corpus
    n_raw = duck.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    n_docs_out = got["doc_id"].nunique()
    assert 0 < n_docs_out < n_raw
    # semi-join path agrees
    monkeypatch.setattr(textops, "KEEP_BROADCAST_IDS", 0)
    got2 = _canon(run())
    for c in g.columns:
        assert (g[c].to_numpy() == got2[c].to_numpy()).all(), c


def test_q4_exists_boundary_and_dedup(ray_session, tmp_path):
    """An order with a line at EXACTLY +60 days is excluded (strict >);
    an order with three late lines counts once."""
    from geo_inference_ray.relational import Q4_LATE_US, q4_late_orders

    d = tmp_path / "q4"
    d.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_orderdate": pa.array([0, 0], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT"]),
    }), d / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2, 2], pa.int64()),
        "l_shipdate": pa.array([Q4_LATE_US, Q4_LATE_US + 1,
                                Q4_LATE_US + 2, Q4_LATE_US + 3],
                               pa.timestamp("us")),
    }), d / "lineitem.parquet")
    out = q4_late_orders(str(d)).to_pandas()
    assert out["o_orderpriority"].tolist() == ["1-URGENT"]
    assert out["n_orders"].tolist() == [1]


def test_q17_broadcast_and_join_paths_agree(ray_session, sf_dir,
                                            monkeypatch):
    from geo_inference_ray import relational

    def run():
        return relational.q17_small_qty(sf_dir).to_pandas()

    broadcast = run()
    monkeypatch.setattr(relational, "Q5_BROADCAST_KEYS", 0)
    joined = run()
    pd.testing.assert_frame_equal(broadcast, joined)


def test_jsonl_cache_invalidates_on_source_change(ray_session,
                                                  tmp_path):
    """Rewriting the source parquet (new mtime/size) must produce a
    fresh JSONL conversion, not the stale cached rows."""
    from geo_inference_ray.sources import jsonl_documents

    d = tmp_path / "jl"
    d.mkdir()

    def write(vals):
        pq.write_table(pa.table({
            "doc_id": pa.array(vals, pa.int64()),
            "text": pa.array([f"t{v}" for v in vals])}),
            d / "documents.parquet")

    write([1, 2])
    first = jsonl_documents(str(d)).to_pandas()
    assert sorted(first["doc_id"]) == [1, 2]
    write([3, 4, 5])
    second = jsonl_documents(str(d)).to_pandas()
    assert sorted(second["doc_id"]) == [3, 4, 5]
