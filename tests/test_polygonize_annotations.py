"""Tests: connected-component labeling, boundary tracing, cross-tile
stitching, and YOLO/COCO exports."""

import json

import numpy as np
import pandas as pd
import pytest

from geo_inference_ray.annotations import (filter_min_area, rings_to_px,
                                           to_coco, to_yolo, yolo_lines)
from geo_inference_ray.polygonize import (label_components, ring_signed_area,
                                          stitch_polygons, trace_rings)
from geo_inference_ray.tiling import GridConfig


def test_label_components_basic():
    m = np.array([
        [1, 1, 0, 2],
        [0, 1, 0, 2],
        [3, 0, 1, 0],
        [3, 3, 0, 0]], dtype=np.uint8)
    labs = label_components(m)
    assert labs[0, 0] == labs[0, 1] == labs[1, 1]
    assert labs[0, 3] == labs[1, 3]
    assert labs[2, 0] == labs[3, 0] == labs[3, 1]
    assert labs[2, 2] not in (labs[0, 0], 0)
    assert (labs[m == 0] == 0).all()


def test_label_components_distinguishes_classes():
    m = np.array([[1, 2], [0, 0]], dtype=np.uint8)
    labs = label_components(m)
    assert labs[0, 0] != labs[0, 1]  # adjacent but different class


def test_label_components_nodata_excluded():
    m = np.array([[255, 1], [1, 1]], dtype=np.uint8)
    labs = label_components(m)
    assert labs[0, 0] == 0


def test_trace_single_pixel():
    rings = trace_rings({(0, 0)})
    assert len(rings) == 1
    assert len(rings[0]) == 4
    assert abs(ring_signed_area(rings[0])) == 1.0


def test_trace_rect_and_hole():
    # 3x3 block with center removed -> outer ring + hole
    pix = {(y, x) for y in range(3) for x in range(3)} - {(1, 1)}
    rings = trace_rings(pix)
    assert len(rings) == 2
    areas = sorted(abs(ring_signed_area(r)) for r in rings)
    assert areas == [1.0, 9.0]


def test_trace_l_shape_area():
    pix = {(0, 0), (0, 1), (1, 0)}
    rings = trace_rings(pix)
    assert len(rings) == 1
    assert abs(ring_signed_area(rings[0])) == 3.0


def test_trace_pinch_junction_simple_rings():
    # 3x3 minus center minus a corner: the cavity touches the exterior
    # at a diagonal-pinch junction.  The sharpest-RIGHT-turn policy must
    # keep every ring simple (no repeated vertices) and preserve the
    # pixel-area invariant; the old left-turn preference crossed into
    # the adjacent loop here and emitted a self-touching ring.
    pix = {(y, x) for y in range(3) for x in range(3)} - {(1, 1), (2, 2)}
    rings = trace_rings(pix)
    for r in rings:
        assert len(set(r)) == len(r), "non-simple ring at pinch junction"
    areas = [ring_signed_area(r) for r in rings]
    assert abs(abs(sum(areas)) - len(pix)) < 1e-9


def test_vectorized_kernels_match_reference():
    """The vectorized labeling/tracing must match the per-pixel
    reference kernels: identical component partition in identical
    first-encounter order, and identical ring-area multisets."""
    from geo_inference_ray.polygonize import (label_components_ref,
                                              trace_rings_ref)

    rng = np.random.default_rng(5)
    for _ in range(25):
        m = (rng.random((13, 13)) < 0.5).astype(np.uint8) * \
            rng.integers(1, 4, (13, 13)).astype(np.uint8)
        a = label_components(m)
        b = label_components_ref(m)

        def parts(labs):
            comp = {}
            for y, x in zip(*np.nonzero(labs)):
                comp.setdefault(labs[y, x], []).append((y, x))
            return [frozenset(v) for _, v in
                    sorted(comp.items(), key=lambda kv: min(kv[1]))]

        assert parts(a) == parts(b)
        for lab in np.unique(a):
            if lab == 0:
                continue
            ys, xs = np.nonzero(a == lab)
            pix = set(zip(ys.tolist(), xs.tolist()))
            r1 = trace_rings(pix)
            r2 = trace_rings_ref(pix)
            a1 = sorted(round(ring_signed_area(r), 6) for r in r1)
            a2 = sorted(round(ring_signed_area(r), 6) for r in r2)
            assert a1 == a2
            assert all(len(set(r)) == len(r) for r in r1)


def test_trace_fuzz_simple_and_area_invariant():
    # fuzz random masks: every component's rings are simple and the
    # signed areas sum to +/- the component pixel count
    rng = np.random.default_rng(20240817)
    for _ in range(40):
        m = (rng.random((10, 10)) < 0.55).astype(np.uint8)
        labs = label_components(m)
        for lab in np.unique(labs):
            if lab == 0:
                continue
            ys, xs = np.nonzero(labs == lab)
            pix = set(zip(ys.tolist(), xs.tolist()))
            rings = trace_rings(pix)
            assert all(len(set(r)) == len(r) for r in rings)
            areas = [ring_signed_area(r) for r in rings]
            assert abs(abs(sum(areas)) - len(pix)) < 1e-9


def _tiles_from_dense(mask: np.ndarray, stride: int) -> pd.DataFrame:
    h, w = mask.shape
    rows = []
    for oy in range(h // stride):
        for ox in range(w // stride):
            sub = mask[oy * stride:(oy + 1) * stride,
                       ox * stride:(ox + 1) * stride]
            rows.append({"oy": oy, "ox": ox, "mask": sub.reshape(-1),
                         "n_valid": int((sub != 255).sum())})
    return pd.DataFrame(rows)


def _grid(h, w, stride):
    return GridConfig(min_lon=0.0, max_lat=float(h), pix=1.0, width=w,
                      height=h, stride=stride)


def test_stitch_component_spanning_tiles():
    # one component crossing a 2x2 tile grid (stride 4, 8x8 raster)
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[2:6, 2:6] = 1  # straddles all 4 tiles
    tiles = _tiles_from_dense(mask, 4)
    polys = stitch_polygons(tiles, _grid(8, 8, 4))
    outers = polys[~polys["is_hole"]]
    assert len(outers) == 1
    assert outers.iloc[0]["area_px"] == 16.0
    assert outers.iloc[0]["n_pixels"] == 16


def test_stitch_separate_classes_not_merged():
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[3, 2:6] = 1
    mask[4, 2:6] = 2  # touching rows, different class
    tiles = _tiles_from_dense(mask, 4)
    polys = stitch_polygons(tiles, _grid(8, 8, 4))
    outers = polys[~polys["is_hole"]]
    assert len(outers) == 2
    assert sorted(outers["class_id"].tolist()) == [1, 2]


def test_stitch_hole_across_tiles():
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[1:7, 1:7] = 1
    mask[3:5, 3:5] = 0  # hole spanning the 4-tile corner
    tiles = _tiles_from_dense(mask, 4)
    polys = stitch_polygons(tiles, _grid(8, 8, 4))
    comp = polys[polys["comp_id"] == polys["comp_id"].iloc[0]]
    assert len(comp) == 2  # outer + hole
    assert comp["is_hole"].sum() == 1
    outer = comp[~comp["is_hole"]].iloc[0]
    assert outer["area_px"] == 36.0  # outer ring area (shoelace, pre-hole)


def test_stitch_matches_unsplit_labeling():
    """Stitched tile decomposition == single-pass labeling of the dense
    mask (component count and pixel counts)."""
    rng = np.random.default_rng(5)
    mask = (rng.uniform(size=(16, 16)) < 0.4).astype(np.uint8)
    tiles = _tiles_from_dense(mask, 4)
    polys = stitch_polygons(tiles, _grid(16, 16, 4))
    outers = polys[~polys["is_hole"]]
    labs = label_components(mask)
    n_comp = len(np.unique(labs[labs > 0]))
    assert outers["comp_id"].nunique() == n_comp
    assert int(outers.drop_duplicates("comp_id")["n_pixels"].sum()) \
        == int((mask == 1).sum())


def test_geo_coords():
    mask = np.zeros((4, 4), dtype=np.uint8)
    mask[0, 0] = 1
    tiles = _tiles_from_dense(mask, 4)
    grid = GridConfig(min_lon=10.0, max_lat=50.0, pix=0.5, width=4,
                      height=4, stride=4)
    polys = stitch_polygons(tiles, grid)
    r = polys.iloc[0]
    assert set(zip(r["xs"], r["ys"])) == {
        (10.0, 50.0), (10.5, 50.0), (10.5, 49.5), (10.0, 49.5)}


def test_min_area_filter():
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[0, 0] = 1          # area 1
    mask[4:8, 4:8] = 2      # area 16
    tiles = _tiles_from_dense(mask, 4)
    polys = stitch_polygons(tiles, _grid(8, 8, 4))
    kept = filter_min_area(polys, 4.0)
    assert set(kept["class_id"]) == {2}


def test_yolo_export():
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[2:6, 2:6] = 1
    tiles = _tiles_from_dense(mask, 4)
    grid = _grid(8, 8, 4)
    polys = stitch_polygons(tiles, grid)
    y = to_yolo(polys, grid)
    assert len(y) == 1
    r = y.iloc[0]
    assert r["x"] == pytest.approx(0.5)
    assert r["y"] == pytest.approx(0.5)
    assert r["w"] == pytest.approx(0.5)
    assert r["h"] == pytest.approx(0.5)
    lines = yolo_lines(y)
    assert lines[0].startswith("1 0.5 0.5 0.5 0.5")


def test_yolo_overlap_filter():
    """Polygon clipped by the image rect below min_overlap is dropped."""
    grid = _grid(8, 8, 4)
    polys = pd.DataFrame([{
        "comp_id": 0, "class_id": 1, "ring_idx": 0, "is_hole": False,
        "n_pixels": 64, "area_px": 64.0,
        # geo ring mostly outside the raster (raster lon 0..8, lat 0..8)
        "xs": np.array([6.0, 14.0, 14.0, 6.0]),
        "ys": np.array([2.0, 2.0, 6.0, 6.0]),
    }])
    y = to_yolo(polys, grid, min_overlap=0.66)
    assert len(y) == 0
    y2 = to_yolo(polys, grid, min_overlap=0.2)
    assert len(y2) == 1


def test_coco_export():
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[2:6, 2:6] = 1
    mask[0, 6:8] = 2
    tiles = _tiles_from_dense(mask, 4)
    grid = _grid(8, 8, 4)
    polys = stitch_polygons(tiles, grid)
    coco = to_coco(polys, grid)
    assert {c["id"] for c in coco["categories"]} == {1, 2}
    assert [a["id"] for a in coco["annotations"]] == [0, 1]
    a = [x for x in coco["annotations"] if x["category_id"] == 1][0]
    assert a["bbox"] == [2.0, 2.0, 4.0, 4.0]
    assert a["area"] == 16.0
    assert a["iscrowd"] == 0
    assert coco["images"][0]["width"] == 8


def test_rings_to_px_roundtrip():
    grid = GridConfig(min_lon=-10.0, max_lat=20.0, pix=0.25, width=16,
                      height=16, stride=4)
    polys = pd.DataFrame([{
        "comp_id": 0, "class_id": 1, "ring_idx": 0, "is_hole": False,
        "n_pixels": 4, "area_px": 4.0,
        "xs": np.array([-10.0, -9.5, -9.5, -10.0]),
        "ys": np.array([20.0, 20.0, 19.5, 19.5]),
    }])
    px = rings_to_px(polys, grid)
    np.testing.assert_allclose(px.iloc[0]["pxs"], [0, 2, 2, 0])
    np.testing.assert_allclose(px.iloc[0]["pys"], [0, 0, 2, 2])


def test_distributed_matches_driver_stitch(ray_session, sf_dir):
    """polygons_distributed == stitch_polygons on the real tile output
    (same comp decomposition, ring areas, and geo coords)."""
    import ray.data as rd

    from geo_inference_ray import stages
    from geo_inference_ray.polygonize import (polygons_distributed,
                                              polygons_from_tiles)
    from geo_inference_ray.tiling import DEFAULT_GRID, mask_tiles

    geo = stages.geo_pipeline(sf_dir, with_cells=False)
    tiles = mask_tiles(geo, DEFAULT_GRID)
    local = polygons_from_tiles(tiles, DEFAULT_GRID)
    tiles2 = mask_tiles(stages.geo_pipeline(sf_dir, with_cells=False),
                        DEFAULT_GRID)
    dist = polygons_distributed(tiles2, DEFAULT_GRID).to_pandas()

    def canon(df):
        df = df.copy()
        df["key"] = [tuple(sorted(zip(x, y)))
                     for x, y in zip(df["xs"], df["ys"])]
        return df.sort_values(["class_id", "n_pixels", "key"]) \
                 .reset_index(drop=True)

    a, b = canon(local), canon(dist)
    assert len(a) == len(b)
    assert (a["class_id"].to_numpy() == b["class_id"].to_numpy()).all()
    assert (a["n_pixels"].to_numpy() == b["n_pixels"].to_numpy()).all()
    assert (a["is_hole"].to_numpy() == b["is_hole"].to_numpy()).all()
    np.testing.assert_allclose(a["area_px"].to_numpy(),
                               b["area_px"].to_numpy())
    for ka, kb in zip(a["key"], b["key"]):
        assert ka == kb


def test_reduce_precision():
    from geo_inference_ray.annotations import reduce_precision

    polys = pd.DataFrame([{
        "comp_id": 0, "class_id": 1, "ring_idx": 0, "is_hole": False,
        "n_pixels": 1, "area_px": 1.0,
        "xs": np.array([1.23456, 2.34567]),
        "ys": np.array([-0.11111, 9.87654]),
    }])
    out = reduce_precision(polys, 2)
    np.testing.assert_allclose(out.iloc[0]["xs"], [1.23, 2.35])
    np.testing.assert_allclose(out.iloc[0]["ys"], [-0.11, 9.88])


def test_coco_other_bucketing():
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[0, 0] = 1
    mask[4, 4] = 2
    tiles = _tiles_from_dense(mask, 4)
    grid = _grid(8, 8, 4)
    polys = stitch_polygons(tiles, grid)
    coco = to_coco(polys, grid,
                   category_names={1: "building", 2: "exotic"},
                   preset_categories=["building"])
    names = {c["name"] for c in coco["categories"]}
    assert names == {"building", "other"}
    other_id = [c["id"] for c in coco["categories"]
                if c["name"] == "other"][0]
    assert other_id == 3  # max preset id + 1
    assert any(a["category_id"] == other_id for a in coco["annotations"])


def test_simplify_rings_and_pipeline_flag(ray_session, sf_dir, tmp_path):
    """simplify_rings reduces vertex counts while keeping rings closed;
    the pipeline flag wires it into the vector chain."""
    from geo_inference_ray.annotations import simplify_rings
    from geo_inference_ray.pipeline import GeoInferenceRay

    # zig-zag ring that collapses under a coarse tolerance
    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 4.0, 0.0])
    ys = np.array([0.0, 0.05, 0.0, 0.05, 0.0, 3.0, 3.0])
    polys = pd.DataFrame([{"comp_id": 0, "class_id": 1, "ring_idx": 0,
                           "is_hole": False, "n_pixels": 12,
                           "area_px": 12.0, "xs": xs, "ys": ys}])
    out = simplify_rings(polys, 0.1)
    assert len(out["xs"].iloc[0]) < len(xs)
    gi = GeoInferenceRay(work_dir=str(tmp_path), mask_to_vec=True,
                         simplify_tolerance=0.25)
    res = gi(sf_dir, run_name="simp")
    gj = json.load(open(res["polygons"]))
    assert len(gj["features"]) > 0


def test_coco_score_license_info():
    from geo_inference_ray.annotations import to_coco

    polys = pd.DataFrame([{
        "comp_id": 0, "class_id": 1, "ring_idx": 0, "is_hole": False,
        "n_pixels": 4, "area_px": 4.0, "score": 0.875,
        "xs": np.array([0.0, 1.0, 1.0, 0.0]),
        "ys": np.array([0.0, 0.0, 1.0, 1.0])}])
    grid = GridConfig(min_lon=0.0, max_lat=4.0, pix=1.0, width=4,
                      height=4, stride=2)
    coco = to_coco(polys, grid, score_col="score", license_id=2,
                   info={"description": "test"},
                   licenses=[{"id": 2, "name": "CC0"}])
    assert coco["annotations"][0]["score"] == 0.875
    assert coco["images"][0]["license"] == 2
    assert coco["info"]["description"] == "test"
    assert coco["licenses"][0]["name"] == "CC0"
    # without the options the blocks are absent (reference behavior)
    plain = to_coco(polys, grid)
    assert "score" not in plain["annotations"][0]
    assert "license" not in plain["images"][0]
    assert "info" not in plain and "licenses" not in plain


def test_polygon_rings_oracle_with_holes(ray_session):
    """The driver-scale data has no holed components, so pin the
    background-cavity SQL against the engine on a synthetic point set
    that rasterizes into a ring with an enclosed cavity."""
    import duckdb
    import ray.data as rd

    from geo_inference_ray.polygonize import polygons_from_tiles
    from geo_inference_ray.tiling import (DEFAULT_GRID, mask_tiles,
                                          sql_polygon_rings)

    def center(py, px):
        return (90.0 - (py + 0.5) * 0.5, -180.0 + (px + 0.5) * 0.5)

    pts = []
    # 3x3 ring around an empty center -> 1 hole; plus a solo pixel
    for py in range(100, 103):
        for px in range(200, 203):
            if (py, px) != (101, 201):
                pts.append(center(py, px))
    pts.append(center(150, 300))
    df = pd.DataFrame(pts, columns=["lat", "lon"])

    geo = rd.from_pandas(df)
    tiles = mask_tiles(geo, DEFAULT_GRID)
    polys = polygons_from_tiles(tiles, DEFAULT_GRID)
    eng = polys.groupby("comp_id", as_index=False).agg(
        class_id=("class_id", "first"), n_pixels=("n_pixels", "first"),
        n_rings=("ring_idx", "size"), n_holes=("is_hole", "sum"))
    outer = polys[~polys["is_hole"]].set_index("comp_id")["area_px"]
    eng["area_px_int"] = eng["comp_id"].map(outer).round().astype("int64")
    assert eng["n_holes"].sum() == 1  # the cavity exists
    # canonical ring order: ring 0 is ALWAYS the outer ring (the
    # polygons oracle relies on this)
    assert not polys[polys["ring_idx"] == 0]["is_hole"].any()
    assert polys[polys["ring_idx"] > 0]["is_hole"].all()

    vals = ",".join(f"({la!r},{lo!r})" for la, lo in pts)
    sql = (f"WITH RECURSIVE geo(lat, lon) AS (VALUES {vals}),"
           + sql_polygon_rings())
    ora = duckdb.sql(sql).df()
    a = eng.sort_values("comp_id").reset_index(drop=True).astype("int64")
    b = ora.sort_values("comp_id").reset_index(drop=True) \
        [a.columns.tolist()].astype("int64")
    assert a.equals(b)
