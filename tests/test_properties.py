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


def test_numpy_duckdb_transcendental_contract():
    """Environment probe (ADVICE r2): the exact oracles rest on two
    cross-library float assumptions.  Measured on this box (2026-08):

    - cos/sin ARE bit-identical numpy vs DuckDB (both call the platform
      libm) — the s2_cells oracle needs exactly this, so assert 0 ULP.
    - ln is NOT: numpy's SIMD log kernel differs from DuckDB's std::log
      by <=1 ULP on ~23% of inputs.  The surprisal oracle survives
      because it only compares floor(-1000*ln(p)) integers, where a
      1-ULP flip matters only if -1000*ln(p) straddles an integer
      (~2^-42 per value).  Assert the <=1-ULP bound AND the quantized
      expression over a dense realistic (count, total) sweep, so a
      toolchain bump that widens either surfaces HERE as an environment
      failure, not as a mysterious oracle mismatch."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    x = np.concatenate([
        np.linspace(1e-9, 1.0, 257),
        np.linspace(1.0, 1e6, 257),
        np.linspace(-50.0, 50.0, 513),  # for cos/sin
    ])
    con = duckdb.connect()
    con.register("v", pa.table({"x": pa.array(x, pa.float64())}))
    got = con.execute(
        "SELECT ln(abs(x) + 1e-12) AS l, cos(x) AS c, sin(x) AS s "
        "FROM v").fetchnumpy()
    np.testing.assert_array_equal(got["c"], np.cos(x))
    np.testing.assert_array_equal(got["s"], np.sin(x))
    ulp = np.abs(got["l"].view(np.int64)
                 - np.log(np.abs(x) + 1e-12).view(np.int64))
    assert int(ulp.max()) <= 1, f"ln diverged by {int(ulp.max())} ULP"

    cnt = np.arange(1, 20001, dtype=np.float64)
    total = 123457.0
    con.register("v2", pa.table({"c": pa.array(cnt)}))
    q = con.execute(
        f"SELECT CAST(floor(-1000.0 * ln(c / {total!r})) AS BIGINT) AS s "
        f"FROM v2").fetchnumpy()["s"]
    mine = np.floor(-1000.0 * np.log(cnt / total)).astype(np.int64)
    np.testing.assert_array_equal(q, mine)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.sampled_from("ab cd ef gh ij".split()),
                         min_size=0, max_size=12),
                min_size=1, max_size=6))
def test_doc_ngram_pairs_matches_bruteforce(docs):
    """The shared shingling kernel (dup_spans / decontaminate) emits
    exactly the brute-force DISTINCT word-3-gram set per doc."""
    import pyarrow as pa

    from geo_inference_ray.textops import doc_ngram_pairs

    batch = pa.table({"text": pa.array([" ".join(d) for d in docs])})
    idx, g = doc_ngram_pairs(batch, 3)
    got = set(zip(idx.tolist(), list(g)))
    exp = set()
    for i, words in enumerate(docs):
        for j in range(len(words) - 2):
            exp.add((i, " ".join(words[j:j + 3])))
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=10**9),
                min_size=1, max_size=10),
       st.integers(min_value=0, max_value=10**6))
def test_mix_sample_targets_invariants(counts, k):
    """The integer mixing arithmetic: per-source targets are monotone
    in source size and never over-allocate the global budget k."""
    import numpy as np

    ws = [int(np.floor(np.sqrt(float(c)))) for c in counts]
    W = sum(ws)
    ts = [(k * w) // W for w in ws]
    assert sum(ts) <= k
    order = np.argsort(counts)
    t_sorted = np.array(ts)[order]
    assert (np.diff(t_sorted) >= 0).all()


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(st.integers(min_value=1, max_value=3),
                          st.integers(min_value=0, max_value=200)),
                min_size=1, max_size=60),
       st.integers(min_value=0, max_value=30))
def test_debounce_jump_scan_matches_bruteforce(events, window):
    """The PRODUCTION jump-scan kernel (relational.debounce_scan) must
    equal the O(n) sequential keep-if-gap-from-last-KEPT reference for
    any (user, ts) multiset and window, including window=0 and heavy
    ts ties.  Raw int timestamps in the same unit as the window, so
    sub-gap windows (1..30 on gaps 0..200) are genuinely exercised."""
    import numpy as np
    import pandas as pd

    from geo_inference_ray.relational import debounce_scan

    g = pd.DataFrame({
        "user_id": [u for u, _ in events],
        "ts": [t for _, t in events],
        "event_id": range(len(events)),
    }).sort_values(["user_id", "ts", "event_id"],
                   kind="stable").reset_index(drop=True)
    uid = g["user_id"].to_numpy()
    ts = g["ts"].to_numpy(dtype=np.int64)
    # brute force
    exp = []
    last_kept: dict[int, int] = {}
    for i in range(len(g)):
        u = uid[i]
        if u not in last_kept or ts[i] - last_kept[u] > window:
            exp.append(int(g["event_id"].iloc[i]))
            last_kept[u] = ts[i]
    idx = debounce_scan(uid, ts, window)
    got = sorted(int(g["event_id"].iloc[k]) for k in idx)
    assert got == sorted(exp)
