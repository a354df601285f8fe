"""Tests for geoext (second-order spatial analytics) plus the two
late-round analytics additions (weighted_median, streaks).

These pin SEMANTICS on tiny hand-checkable inputs (ring-1 scatter
geometry, chord-metric math, envelope-overlap edges, nearest-centroid
tie-break, weighted-median boundary, streak islands);
scripts/compare.py covers value equality vs DuckDB on the shared
tables.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# cell_smooth
# ---------------------------------------------------------------------------

def test_cell_smooth_equals_ring1_neighborhood_sum(ray_session):
    import ray.data as rd

    from geo_inference_ray.geoext import cell_smooth
    from geo_inference_ray.knn import HEX_RING1_OFFSETS

    # three pages in one cell, one page in its +1 neighbor, one far away
    cells = [100 * 65536 + 200] * 3 + [100 * 65536 + 201] + [7_000_000]
    ds = rd.from_arrow(pa.table({"hex7": pa.array(cells, pa.int64())}))
    out = cell_smooth(ds).to_pandas().set_index("hex7")["n_smooth"]

    # brute-force reference: n_smooth(c) = sum over counts of c's disk
    counts = pd.Series(cells).value_counts()
    for cell, got in out.items():
        want = sum(counts.get(cell + o, 0) for o in HEX_RING1_OFFSETS)
        assert got == want
    # a populated cell's smoothed count covers itself + neighbors
    assert out[100 * 65536 + 200] == 4
    assert out[100 * 65536 + 201] == 4
    # an EMPTY cell adjacent to a populated one still appears
    assert out[100 * 65536 + 199] == 3
    assert out[7_000_000] == 1


# ---------------------------------------------------------------------------
# track_legs
# ---------------------------------------------------------------------------

def test_track_legs_chord_math_and_grouping(ray_session):
    from geo_inference_ray.geoext import track_legs

    res = track_legs(SF).to_pandas().sort_values("cluster")
    assert set(res.columns) == {"cluster", "n_legs", "max_leg_km",
                                "sum_leg_mm"}
    assert (res["n_legs"] >= 1).all()
    # chord distance is bounded by Earth's diameter
    assert (res["max_leg_km"] <= 12742.0).all()
    assert (res["max_leg_km"] > 0).all()
    # quantized sum is consistent with the max leg
    assert (res["sum_leg_mm"]
            >= np.floor(res["max_leg_km"] * 1e6)).all()

    # brute-force reference on the same geocode
    from geo_inference_ray import synth
    ids = pq.read_table(f"{SF}/documents.parquet")["doc_id"].to_numpy()
    lat, lon, cluster = synth.geocode_ids(np.sort(ids))
    df = pd.DataFrame({"cluster": cluster, "lat": lat, "lon": lon},
                      index=np.sort(ids)).sort_index()
    want = {}
    for cl, g in df.groupby("cluster"):
        if len(g) < 2:
            continue
        la, lo = g["lat"].to_numpy(), g["lon"].to_numpy()
        sd1 = np.sin(np.deg2rad(la[1:] - la[:-1]) / 2.0)
        c1 = np.cos(np.deg2rad(la[:-1]))
        c2 = np.cos(np.deg2rad(la[1:]))
        sd2 = np.sin(np.deg2rad(lo[1:] - lo[:-1]) / 2.0)
        a = sd1 * sd1 + ((c1 * c2) * sd2) * sd2
        chord = 12742.0 * np.sqrt(a)
        want[cl] = (len(chord), chord.max(),
                    int(np.floor(chord * 1e6).astype(np.int64).sum()))
    got = {r.cluster: (r.n_legs, r.max_leg_km, r.sum_leg_mm)
           for r in res.itertuples()}
    assert got == want


# ---------------------------------------------------------------------------
# bbox_overlap_counts
# ---------------------------------------------------------------------------

def test_bbox_overlap_is_superset_of_pip(ray_session):
    """Envelope overlap is the FILTER phase: every exact point-in-
    polygon hit must be among the bbox candidates."""
    import __ray_entry__ as entrymod

    from geo_inference_ray.geoext import bbox_overlap_counts

    cand = bbox_overlap_counts(SF).to_pandas() \
        .set_index("poly_id")["n_docs"]
    exact = entrymod.q_pip_inner(SF).to_pandas() \
        .groupby("poly_id").size()
    for pid, n_exact in exact.items():
        assert cand.get(pid, 0) >= n_exact


def test_bbox_overlap_edge_inclusive(ray_session):
    """A page exactly eps away from the bbox edge still overlaps
    (closed intervals on both sides)."""
    from geo_inference_ray import synth
    from geo_inference_ray.geoext import BBOX_EPS_DEG

    p = synth.polygon_arrays()[0]
    xmin, ymin, xmax, ymax = p["bbox"]
    lat = np.array([ymax + BBOX_EPS_DEG])
    lon = np.array([(xmin + xmax) / 2])
    hit = ((lat - BBOX_EPS_DEG) <= ymax) & ((lat + BBOX_EPS_DEG) >= ymin) \
        & ((lon - BBOX_EPS_DEG) <= xmax) & ((lon + BBOX_EPS_DEG) >= xmin)
    assert hit.all()


# ---------------------------------------------------------------------------
# nearest_poly
# ---------------------------------------------------------------------------

def test_nearest_poly_assignment_is_argmin(ray_session):
    from geo_inference_ray import synth
    from geo_inference_ray.geoext import nearest_poly, poly_centroids

    res = nearest_poly(SF).to_pandas()
    ids = res["doc_id"].to_numpy()
    lat, lon, _ = synth.geocode_ids(ids)
    pids, cxs, cys = poly_centroids()
    d2 = (lat[:, None] - cys[None, :]) ** 2 \
        + (lon[:, None] - cxs[None, :]) ** 2
    assert np.array_equal(res["poly_id"].to_numpy(),
                          pids[np.argmin(d2, axis=1)])
    assert np.array_equal(res["d2"].to_numpy(), d2.min(axis=1))
    # every page is assigned exactly once
    assert len(res) == len(np.unique(ids)) == len(ids)


def test_poly_centroid_terms_reconstruct_doubles():
    from geo_inference_ray import synth
    from geo_inference_ray.geoext import poly_centroid_terms, poly_centroids

    pids, cxs, cys = poly_centroids()
    assert list(pids) == sorted(p["poly_id"] for p in synth.POLYGONS)
    for (p, sx, sy, n), cx, cy in zip(poly_centroid_terms(), cxs, cys):
        assert cx == float(sx) / 1000.0 / n
        assert cy == float(sy) / 1000.0 / n


# ---------------------------------------------------------------------------
# weighted_median
# ---------------------------------------------------------------------------

def _write_lineitem(tmp_path, rows):
    t = pa.table({
        "l_orderkey": pa.array(range(len(rows)), pa.int64()),
        "l_partkey": pa.array([0] * len(rows), pa.int64()),
        "l_suppkey": pa.array([0] * len(rows), pa.int64()),
        "l_linenumber": pa.array([1] * len(rows), pa.int32()),
        "l_quantity": pa.array([float(r[1]) for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array([0] * len(rows), pa.timestamp("us")),
    })
    d = tmp_path / "li"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")
    return str(d)


def test_weighted_median_lower_median_boundary(ray_session, tmp_path):
    from geo_inference_ray.analytics import weighted_median

    # flag A: prices 1.00 (qty 1), 2.00 (qty 1) -> total 2, 2*cum at
    # 1.00 is 2 >= 2 -> LOWER median 100 cents.
    # flag B: prices 1.00 (qty 1), 2.00 (qty 3) -> 2*cum at 1.00 is
    # 2 < 4 -> median 200 cents.
    sf = _write_lineitem(tmp_path, [
        ("A", 1, 1.00), ("A", 1, 2.00),
        ("B", 1, 1.00), ("B", 3, 2.00),
    ])
    res = weighted_median(sf).to_pandas() \
        .set_index("l_returnflag")["wmedian_cents"]
    assert res["A"] == 100
    assert res["B"] == 200


# ---------------------------------------------------------------------------
# streaks
# ---------------------------------------------------------------------------

def test_streaks_islands_and_duplicate_days(ray_session, tmp_path):
    from geo_inference_ray.analytics import streaks

    day_us = 86_400_000_000
    rows = []
    # user 1: days 10,11,12 then 20,21 (two events on day 11 -> dedup)
    for d in (10, 11, 11, 12, 20, 21):
        rows.append((len(rows), d * day_us + 5, 1, "view"))
    # user 2: single day
    rows.append((len(rows), 40 * day_us, 2, "view"))

    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    res = streaks(str(d)).to_pandas().set_index("user_id")
    assert res.loc[1, "n_active_days"] == 5
    assert res.loc[1, "max_streak"] == 3
    assert res.loc[2, "n_active_days"] == 1
    assert res.loc[2, "max_streak"] == 1
