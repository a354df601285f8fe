"""Vector -> annotation exports: affine transforms, YOLO rows, COCO
documents — the reference's post-processing chain re-expressed over
polygon ring tables.

Reference parity (studied, not copied):
* affine transform of geometry M8/M9
  (/root/reference/geo_inference/utils/geo_transforms.py:32-136)
* geo->px conversion M11 (geo_transforms.py:138-195): spatial semi-join
  of polygons against the image bounds, then inverse affine
* area floor filter M12 (polygon.py:56-64, default min_area=40)
* YOLO bbox math M14/M15 (polygon.py:122-148): overlap fraction filter
  (default 0.66 vs the image rect), bbox -> normalized (x,y,w,h),
  space-delimited rows (class x y w h)
* COCO M16-M20 (geo_transforms.py:260-505): bbox [x,y,w,h],
  segmentation = flattened exterior ring, sequential annotation ids,
  category dedup, single-document JSON assembly
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

from .geom import affine_apply, affine_invert, clip_to_rect, shoelace_area
from .tiling import GridConfig


def grid_affine(grid: GridConfig):
    """Pixel -> geo affine (a, b, c, d, e, f): lon = a*px + c,
    lat = e*py + f (north-up raster, rasterio ordering)."""
    return (grid.pix, 0.0, grid.min_lon, 0.0, -grid.pix, grid.max_lat)


def rings_to_px(polys: pd.DataFrame, grid: GridConfig) -> pd.DataFrame:
    """geo rings -> pixel rings via the inverse grid affine (M11)."""
    inv = affine_invert(*grid_affine(grid))
    out = polys.copy()
    pxs, pys = [], []
    for r in polys.itertuples():
        x, y = affine_apply(*inv, np.asarray(r.xs), np.asarray(r.ys))
        pxs.append(x)
        pys.append(y)
    out["pxs"] = pxs
    out["pys"] = pys
    return out


def filter_min_area(polys: pd.DataFrame, min_area: float) -> pd.DataFrame:
    """M12: drop polygons with outer-ring pixel area below min_area."""
    keep = polys["area_px"] >= min_area
    return polys[keep].reset_index(drop=True)


def simplify_rings(polys: pd.DataFrame, tolerance: float) -> pd.DataFrame:
    """M13: Douglas–Peucker simplify every ring (reference
    ``mask_to_poly_geojson(simplify=True, tolerance=...)``,
    polygon.py:67-68) — wired into the pipeline/CLI via
    ``simplify_tolerance``."""
    from .geom import simplify_dp

    out = polys.copy()
    xs_out, ys_out = [], []
    for r in polys.itertuples():
        x, y = simplify_dp(np.asarray(r.xs), np.asarray(r.ys), tolerance)
        xs_out.append(x)
        ys_out.append(y)
    out["xs"] = xs_out
    out["ys"] = ys_out
    return out


def reduce_precision(polys: pd.DataFrame, decimals: int) -> pd.DataFrame:
    """M10: round ring coordinates to n decimals (reference
    _reduce_geom_precision, geo_transforms.py:26-30)."""
    out = polys.copy()
    out["xs"] = [np.round(np.asarray(x), decimals) for x in polys["xs"]]
    out["ys"] = [np.round(np.asarray(y), decimals) for y in polys["ys"]]
    return out


def to_yolo(polys: pd.DataFrame, grid: GridConfig,
            min_overlap: float = 0.66) -> pd.DataFrame:
    """Outer rings -> YOLO rows (class_id, x, y, w, h) normalized to the
    raster dims; polygons whose clipped-area fraction inside the image
    rect is below ``min_overlap`` are dropped (M14/M15)."""
    px = rings_to_px(polys[~polys["is_hole"]], grid)
    W, H = grid.width, grid.height
    rows = []
    for r in px.itertuples():
        xs, ys = np.asarray(r.pxs), np.asarray(r.pys)
        area = shoelace_area(xs, ys)
        if area == 0:
            continue
        cx, cy = clip_to_rect(xs, ys, 0, 0, W, H)
        if len(cx) == 0 or shoelace_area(cx, cy) / area < min_overlap:
            continue
        minx, maxx = xs.min(), xs.max()
        miny, maxy = ys.min(), ys.max()
        rows.append({
            "class_id": r.class_id,
            "x": (minx + maxx) / 2.0 / W,
            "y": (miny + maxy) / 2.0 / H,
            "w": (maxx - minx) / W,
            "h": (maxy - miny) / H,
        })
    return pd.DataFrame(rows, columns=["class_id", "x", "y", "w", "h"])


def yolo_lines(yolo_df: pd.DataFrame) -> list[str]:
    """Space-delimited, no header (W3 sink format)."""
    return [f"{int(r.class_id)} {r.x} {r.y} {r.w} {r.h}"
            for r in yolo_df.itertuples()]


def to_coco(polys: pd.DataFrame, grid: GridConfig,
            image_fname: str = "mask.tif",
            starting_id: int = 0,
            category_names: dict[int, str] | None = None,
            preset_categories: list[str] | None = None,
            score_col: str | None = None,
            license_id: int | None = None,
            info: dict | None = None,
            licenses: list[dict] | None = None) -> dict:
    """Outer rings -> single-document COCO dict (M16-M20, W4).

    Annotation ids are globally sequential in deterministic
    (comp_id) order — the reference's range(starting_id, ...) id
    assignment (geo_transforms.py:469-470).  ``preset_categories``:
    classes whose name is not preset are bucketed into "other" with the
    next sequential id (M19 "other" bucketing,
    geo_transforms.py:416-470).  ``score_col`` adds the reference's
    optional per-annotation score (geo_transforms.py:474-493);
    ``license_id`` stamps the image record, and ``info``/``licenses``
    add the optional top-level COCO blocks (make_coco_image_dict,
    geo_transforms.py:352-375)."""
    px = rings_to_px(polys[~polys["is_hole"]], grid) \
        .sort_values("comp_id", kind="stable")
    cats = sorted(px["class_id"].unique().tolist())
    names = {int(c): (category_names or {}).get(int(c), f"class_{int(c)}")
             for c in cats}
    if preset_categories is not None:
        other_id = max(cats, default=0) + 1
        remap = {}
        for c in cats:
            if names[c] not in preset_categories:
                remap[c] = other_id
        if remap:
            px = px.copy()
            px["class_id"] = px["class_id"].map(
                lambda c: remap.get(int(c), int(c)))
            cats = sorted(px["class_id"].unique().tolist())
            names = {int(c): ("other" if c == other_id
                              else names.get(int(c), f"class_{int(c)}"))
                     for c in cats}
    cat_records = [{"id": int(c), "name": names[int(c)],
                    "supercategory": "mask"} for c in cats]
    annos = []
    for i, r in enumerate(px.itertuples()):
        xs, ys = np.asarray(r.pxs), np.asarray(r.pys)
        seg = np.column_stack([xs, ys]).reshape(-1).tolist()
        minx, miny = float(xs.min()), float(ys.min())
        w, h = float(xs.max() - minx), float(ys.max() - miny)
        rec = {
            "id": starting_id + i,
            "image_id": 1,
            "category_id": int(r.class_id),
            "segmentation": [seg],
            "area": float(shoelace_area(xs, ys)),
            "bbox": [minx, miny, w, h],
            "iscrowd": 0,
        }
        if score_col is not None:
            rec["score"] = float(getattr(r, score_col))
        annos.append(rec)
    image_rec = {"id": 1, "file_name": image_fname,
                 "width": grid.width, "height": grid.height}
    if license_id is not None:
        image_rec["license"] = license_id
    out = {
        "images": [image_rec],
        "categories": cat_records,
        "annotations": annos,
    }
    if info is not None:
        out["info"] = info
    if licenses is not None:
        out["licenses"] = licenses
    return out


def write_coco(coco: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(coco, f)


def bbox_corners_to_coco(minx, miny, maxx, maxy):
    """M16: [minx, miny, maxx, maxy] -> [minx, miny, w, h]."""
    return [minx, miny, maxx - minx, maxy - miny]
