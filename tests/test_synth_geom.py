"""Unit tests: deterministic synthesis, geocode/hex bit-identity vs the
DuckDB oracle, geometry kernels (PIP, STRtree, area, clip, simplify)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from geo_inference_ray import synth
from geo_inference_ray.geom import (STRtree, affine_apply, affine_invert,
                                    clip_to_rect, point_in_polygon,
                                    shoelace_area, simplify_dp)


def _doc_ids(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])["doc_id"].to_numpy()


def test_geocode_bit_identity_vs_duckdb(duck, sf_dir):
    sql = ("WITH " + synth.SQL_PAGES + "," + synth.SQL_GEO +
           "," + synth.sql_hex_chain() +
           " SELECT doc_id, cluster, lat, lon, hex7, hex9 FROM hex9"
           " ORDER BY doc_id")
    df = duck.sql(sql).df()
    ids = _doc_ids(sf_dir)
    lat, lon, cluster = synth.geocode_ids(ids)
    assert (df["cluster"].to_numpy() == cluster).all()
    assert (df["lat"].to_numpy() == lat).all()      # bitwise
    assert (df["lon"].to_numpy() == lon).all()      # bitwise
    assert (df["hex7"].to_numpy() == synth.hex_cell(
        lat, lon, synth.HEX7_SIZE)).all()
    assert (df["hex9"].to_numpy() == synth.hex_cell(
        lat, lon, synth.HEX9_SIZE)).all()


def test_geocode_is_skewed(sf_dir):
    ids = _doc_ids(sf_dir)
    _, _, cluster = synth.geocode_ids(ids)
    frac0 = (cluster == 0).mean()
    assert 0.3 < frac0 < 0.5  # hot cluster ~40%


def test_hex_roundtrip_center():
    lat = np.array([0.0, 10.3, -45.7, 60.0])
    lon = np.array([0.0, -120.2, 30.9, 179.0])
    c = synth.hex_cell(lat, lon, synth.HEX7_SIZE)
    clat, clon = synth.hex_cell_center(c, synth.HEX7_SIZE)
    c2 = synth.hex_cell(clat, clon, synth.HEX7_SIZE)
    assert (c == c2).all()  # center re-encodes to the same cell
    # center is within one cell size of the point
    assert np.all(np.hypot(clat - lat, clon - lon) < 2 * synth.HEX7_SIZE)


def test_pip_square_and_concave():
    # unit square
    x1 = np.array([0.0, 1.0, 1.0, 0.0])
    y1 = np.array([0.0, 0.0, 1.0, 1.0])
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    px = np.array([0.5, 1.5, -0.1, 0.99])
    py = np.array([0.5, 0.5, 0.5, 0.01])
    assert point_in_polygon(px, py, x1, y1, x2, y2).tolist() == \
        [True, False, False, True]
    # concave L-shape: (0,0)(2,0)(2,1)(1,1)(1,2)(0,2)
    xs = np.array([0, 2, 2, 1, 1, 0], dtype=float)
    ys = np.array([0, 0, 1, 1, 2, 2], dtype=float)
    xe, ye = np.roll(xs, -1), np.roll(ys, -1)
    px = np.array([1.5, 1.5, 0.5])
    py = np.array([0.5, 1.5, 1.5])
    assert point_in_polygon(px, py, xs, ys, xe, ye).tolist() == \
        [True, False, True]


def test_pip_matches_duckdb(duck, sf_dir):
    sql = ("WITH " + synth.SQL_PAGES + "," + synth.SQL_GEO + "," +
           synth.sql_polygon_edges() + "," + synth.SQL_PIP_PAIRS +
           " SELECT doc_id, poly_id FROM pip ORDER BY doc_id, poly_id")
    dfp = duck.sql(sql).df()
    ids = _doc_ids(sf_dir)
    lat, lon, _ = synth.geocode_ids(ids)
    polys = synth.polygon_arrays()
    tree = STRtree(np.array([p["bbox"] for p in polys]))
    pairs = []
    for item, pts in tree.query_points_bulk(lon, lat):
        p = polys[item]
        inside = point_in_polygon(lon[pts], lat[pts],
                                  p["x1"], p["y1"], p["x2"], p["y2"])
        pairs.extend((int(ids[r]), p["poly_id"]) for r in pts[inside])
    pairs.sort()
    got = list(zip(dfp["doc_id"].tolist(), dfp["poly_id"].tolist()))
    assert pairs == got
    assert len(pairs) > 0


def test_strtree_query():
    rng = np.random.default_rng(7)
    boxes = np.sort(rng.uniform(0, 100, (500, 2, 2)), axis=1)
    boxes = boxes.transpose(0, 2, 1).reshape(500, 4)[:, [0, 2, 1, 3]]
    # boxes now [minx, miny, maxx, maxy]
    tree = STRtree(boxes)
    for qx, qy in [(10, 10), (50, 50), (99, 1)]:
        got = np.sort(tree.query_point(qx, qy))
        brute = np.nonzero((boxes[:, 0] <= qx) & (boxes[:, 2] >= qx) &
                           (boxes[:, 1] <= qy) & (boxes[:, 3] >= qy))[0]
        assert got.tolist() == brute.tolist()


def test_strtree_empty():
    tree = STRtree(np.empty((0, 4)))
    assert len(tree.query_point(0, 0)) == 0


def test_strtree_bulk_descend_matches_linear():
    """Above LINEAR_LAYER_MAX items, query_points_bulk descends the
    packed tree; the batched descent must return exactly the linear
    scan's (item, point-index) candidates on a 1000-polygon layer."""
    rng = np.random.default_rng(42)
    n = 1000
    boxes = np.empty((n, 4))
    cx = rng.uniform(0, 100, n)
    cy = rng.uniform(0, 100, n)
    hw = rng.uniform(0.1, 3.0, n)
    boxes[:, 0], boxes[:, 2] = cx - hw, cx + hw
    boxes[:, 1], boxes[:, 3] = cy - hw, cy + hw
    tree = STRtree(boxes)
    xs = rng.uniform(-5, 105, 5000)
    ys = rng.uniform(-5, 105, 5000)
    lin = tree._bulk_linear(xs, ys)
    dsc = tree._bulk_descend(xs, ys)
    assert len(lin) == len(dsc)
    for (ia, pa_), (ib, pb_) in zip(lin, dsc):
        assert ia == ib
        assert pa_.tolist() == pb_.tolist()
    # dispatch: large layer takes the descent path
    assert n > STRtree.LINEAR_LAYER_MAX
    got = tree.query_points_bulk(xs, ys)
    assert [(i, p.tolist()) for i, p in got] == \
        [(i, p.tolist()) for i, p in dsc]


def test_shoelace_area():
    xs = np.array([0.0, 4.0, 4.0, 0.0])
    ys = np.array([0.0, 0.0, 3.0, 3.0])
    assert shoelace_area(xs, ys) == pytest.approx(12.0)


def test_clip_to_rect():
    # triangle half outside the unit rect
    xs = np.array([-1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0])
    cx, cy = clip_to_rect(xs, ys, 0.0, 0.0, 1.0, 1.0)
    # clipped shape is (0,0),(1,0),(0.5,1),(0,1) -> area 0.75
    assert shoelace_area(cx, cy) == pytest.approx(0.75)


def test_simplify_dp():
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = np.array([0.0, 0.001, 0.0, 0.001, 0.0])
    sx, sy = simplify_dp(xs, ys, 0.01)
    assert len(sx) == 2  # collinear within tolerance collapses


def test_affine_roundtrip():
    a = (0.5, 0.0, 100.0, 0.0, -0.5, 200.0)
    xs = np.array([1.0, 5.0, 9.0])
    ys = np.array([2.0, 4.0, 8.0])
    gx, gy = affine_apply(*a, xs, ys)
    inv = affine_invert(*a)
    bx, by = affine_apply(*inv, gx, gy)
    np.testing.assert_allclose(bx, xs, atol=1e-12)
    np.testing.assert_allclose(by, ys, atol=1e-12)
