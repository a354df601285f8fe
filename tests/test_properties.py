"""Property-based tests (hypothesis) for the geometry and tiling
invariants — beyond the reference's test strategy (SURVEY §5 notes the
reference has no property testing)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geo_inference_ray import synth
from geo_inference_ray.geom import point_in_polygon, shoelace_area
from geo_inference_ray.polygonize import (label_components, ring_signed_area,
                                          trace_rings)
from geo_inference_ray.window import base_window


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=10**7))
def test_geocode_bounds_and_determinism(doc_id):
    ids = np.array([doc_id, doc_id], dtype=np.int64)
    lat, lon, cluster = synth.geocode_ids(ids)
    assert lat[0] == lat[1] and lon[0] == lon[1]
    assert -90.0 <= lat[0] <= 90.0
    assert -180.0 <= lon[0] <= 180.0
    assert 0 <= cluster[0] < 100


@settings(max_examples=30, deadline=None)
@given(st.floats(min_value=-89.0, max_value=89.0),
       st.floats(min_value=-179.0, max_value=179.0),
       st.floats(min_value=0.05, max_value=2.0))
def test_hex_cell_contains_its_center(lat, lon, size):
    """Re-encoding a cell's center yields the same cell (fixed point)."""
    c = synth.hex_cell(np.array([lat]), np.array([lon]), size)
    clat, clon = synth.hex_cell_center(c, size)
    c2 = synth.hex_cell(clat, clon, size)
    assert c[0] == c2[0]


def _dist_to_segments(px, py, xs, ys):
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    dx, dy = x2 - xs, y2 - ys
    ln = dx * dx + dy * dy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.clip(((px - xs) * dx + (py - ys) * dy) / np.where(ln == 0, 1, ln),
                    0, 1)
    cx, cy = xs + t * dx, ys + t * dy
    return float(np.min(np.hypot(px - cx, py - cy)))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.floats(-10, 10), st.floats(-10, 10)),
                min_size=3, max_size=8),
       st.floats(-12, 12), st.floats(-12, 12))
def test_pip_matches_winding_independent_check(ring, px, py):
    """Crossing-number result is invariant under ring reversal — for
    points NOT on the boundary (boundary behavior follows the half-open
    edge convention, which is orientation-dependent but identical
    between the numpy kernel and the SQL oracle)."""
    from hypothesis import assume

    xs = np.array([p[0] for p in ring])
    ys = np.array([p[1] for p in ring])
    assume(_dist_to_segments(px, py, xs, ys) > 1e-9)
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    fwd = point_in_polygon(np.array([px]), np.array([py]), xs, ys, x2, y2)
    rxs, rys = xs[::-1], ys[::-1]
    rx2, ry2 = np.roll(rxs, -1), np.roll(rys, -1)
    rev = point_in_polygon(np.array([px]), np.array([py]),
                           rxs, rys, rx2, ry2)
    assert fwd[0] == rev[0]


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=2**31))
def test_trace_rings_area_identity(seed):
    """For any pixel blob: outer ring area - hole areas == pixel count,
    per connected component."""
    rng = np.random.default_rng(seed)
    mask = (rng.uniform(size=(8, 8)) < 0.45).astype(np.uint8)
    labs = label_components(mask)
    for lab in np.unique(labs[labs > 0]):
        pix = set(zip(*np.nonzero(labs == lab)))
        rings = trace_rings(pix)
        areas = [ring_signed_area(r) for r in rings]
        outer = int(np.argmax(np.abs(areas)))
        net = abs(areas[outer]) - sum(
            abs(a) for i, a in enumerate(areas) if i != outer)
        assert net == len(pix)


@settings(max_examples=20, deadline=None)
@given(st.sampled_from([4, 8, 16, 32]))
def test_window_partition_of_unity(patch):
    """Interior Hann windows overlap-add to exactly 1 (the merge
    normalization relies on it)."""
    w = base_window(patch)
    s = patch // 2
    total = w[:s, :s] + w[:s, s:] + w[s:, :s] + w[s:, s:]
    np.testing.assert_allclose(total, np.ones((s, s)), atol=1e-12)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                min_size=1, max_size=12))
def test_shoelace_nonnegative(pts):
    xs = np.array([p[0] for p in pts], dtype=float)
    ys = np.array([p[1] for p in pts], dtype=float)
    assert shoelace_area(xs, ys) >= 0.0
