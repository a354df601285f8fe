"""Second-order spatial analytics over the geocoded web pages.

Extends the engine's north-rule spatial core (cells.py / knn.py /
geom.py) with the derived spatial operators a web-scale geo pipeline
layers on top of the raw join:

- :func:`cell_smooth` — ring-1 neighborhood density smoothing on the
  hex grid (the H3 ``grid_disk`` aggregate);
- :func:`track_legs` — per-cluster ordered great-circle track legs
  (chord metric), the trajectory-length primitive;
- :func:`bbox_overlap_counts` — the envelope-overlap *filter phase* of
  a spatial join (the counterpart of stages.PIPJoiner's exact refine
  phase; reference analog: geo_inference's bbox prefilter before the
  RTree probe, geo_transforms.py:197-258);
- :func:`nearest_poly` — nearest-centroid polygon assignment (the
  "label every point by closest zone" broadcast pattern).

House rules (relational.py): every emitted float is computed with the
exact same IEEE-754 expression order as its DuckDB oracle mirror in
``__ray_entry__``; sums that would be order-dependent in float are
carried as integers (floor-quantized millimeters).  ``asin``/``atan2``
differ between numpy and DuckDB by up to 2 ulp on this box (measured),
so the leg metric is the great-circle CHORD ``2R*sin(theta/2) =
2R*sqrt(a)`` — monotone-equivalent to haversine ``2R*asin(sqrt(a))``
and bit-exact on both engines (sin/cos/sqrt/radians all match).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import synth
from .knn import HEX_RING1_OFFSETS
from .relational import _hash_partitioned, _parquet_rows

EARTH_DIAMETER_KM = 12742.0           # 2 * 6371 — folded identically in SQL
BBOX_EPS_DEG = 0.25                   # half-width of the per-page query box


def _docs_rows(sf_dir: str) -> int:
    return _parquet_rows(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# cell_smooth — ring-1 hex density smoothing
# ---------------------------------------------------------------------------

def cell_smooth(ds):
    """Per-hex7-cell page count smoothed over the ring-1 neighborhood:
    for every target cell, the sum of counts of the cell itself and its
    6 axial neighbors (knn.HEX_RING1_OFFSETS).  Cells with no pages of
    their own still appear when a neighbor is populated — exactly the
    H3 ``grid_disk(k=1)`` density aggregate.

    Scale shape: map-side partial counts (one row per cell per batch),
    ONE groupby-sum to exact per-cell counts, then a 7x scatter of the
    *aggregated* cell rows (never the pages) and a second groupby-sum.
    Both shuffles carry O(distinct cells), not O(pages).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cell = batch["hex7"].to_numpy()
        u, c = np.unique(cell, return_counts=True)
        return pa.table({"hex7": pa.array(u),
                         "n": pa.array(c.astype(np.int64))})

    counts = ds.select_columns(["hex7"]) \
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("hex7").aggregate(Sum("n", alias_name="n"))

    offs = np.asarray(HEX_RING1_OFFSETS, dtype=np.int64)

    def scatter(batch: pa.Table) -> pa.Table:
        cell = batch["hex7"].to_numpy()
        n = batch["n"].to_numpy()
        idx = np.repeat(np.arange(len(cell)), len(offs))
        tgt = cell[idx] + np.tile(offs, len(cell))
        return pa.table({"hex7": pa.array(tgt),
                         "n": pa.array(n[idx])})

    return counts.map_batches(scatter, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .groupby("hex7").aggregate(Sum("n", alias_name="n_smooth"))


# ---------------------------------------------------------------------------
# track_legs — per-cluster ordered great-circle legs (chord metric)
# ---------------------------------------------------------------------------

def track_legs(sf_dir: str):
    """Per-cluster track statistics over the legs between consecutive
    pages ordered by doc_id: leg count, longest leg (chord km, exact
    double — max of identically-computed per-row values), and total
    length floor-quantized to integer millimeters (order-independent
    sum; overflows int64 only past ~7e8 legs *per cluster* at the
    20,000 km max-leg bound — document-scale safe).

    Chord metric: ``a = sin^2(dlat/2) + cos(lat1) cos(lat2)
    sin^2(dlon/2)`` (the haversine "a"), leg = ``12742.0 * sqrt(a)`` km
    — see module docstring for why asin is avoided.

    Scale shape: ONE hash-partition exchange on cluster, then a single
    vectorized sort + shift kernel per partition (no window shuffle,
    no per-cluster Python).
    """
    from .stages import geo_pipeline

    ds = geo_pipeline(sf_dir, with_cells=False) \
        .select_columns(["cluster", "doc_id", "lat", "lon"])

    def legs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster", "doc_id"], kind="stable")
        cl = g["cluster"].to_numpy()
        lat = g["lat"].to_numpy()
        lon = g["lon"].to_numpy()
        same = cl[1:] == cl[:-1] if len(g) else np.zeros(0, dtype=bool)
        lat1, lat2 = lat[:-1][same], lat[1:][same]
        lon1, lon2 = lon[:-1][same], lon[1:][same]
        # expression order mirrors the SQL oracle term-for-term
        sd1 = np.sin(np.deg2rad(lat2 - lat1) / 2.0)
        c1 = np.cos(np.deg2rad(lat1))
        c2 = np.cos(np.deg2rad(lat2))
        sd2 = np.sin(np.deg2rad(lon2 - lon1) / 2.0)
        a = sd1 * sd1 + ((c1 * c2) * sd2) * sd2
        chord_km = EARTH_DIAMETER_KM * np.sqrt(a)
        mm = np.floor(chord_km * 1000000.0).astype(np.int64)
        t = pd.DataFrame({"cluster": cl[1:][same], "km": chord_km,
                          "mm": mm})
        out = t.groupby("cluster", as_index=False).agg(
            n_legs=("km", "size"), max_leg_km=("km", "max"),
            sum_leg_mm=("mm", "sum"))
        out["n_legs"] = out["n_legs"].astype(np.int64)
        if len(out) == 0:
            return pd.DataFrame({
                "cluster": pd.Series(dtype="int64"),
                "n_legs": pd.Series(dtype="int64"),
                "max_leg_km": pd.Series(dtype="float64"),
                "sum_leg_mm": pd.Series(dtype="int64")})
        return out

    return _hash_partitioned(ds, "cluster", legs_part,
                             rows_hint=_docs_rows(sf_dir))


# ---------------------------------------------------------------------------
# bbox_overlap_counts — envelope-overlap join (filter phase)
# ---------------------------------------------------------------------------

def bbox_overlap_counts(sf_dir: str, eps: float = BBOX_EPS_DEG):
    """Per-polygon count of pages whose eps-box ``[lat+-eps, lon+-eps]``
    overlaps the polygon's bounding box — the candidate-generation
    filter phase of a spatial join (PIPJoiner is the exact refine
    phase).  Polygons with zero candidates are absent (inner-join
    semantics, matching the SQL mirror).

    Scale shape: the 12-entry bbox layer is a module constant (on a
    cluster: ``ray.put`` once); per batch a vectorized
    (rows x n_polys) interval-overlap mask reduces to per-polygon
    partial counts, so the shuffle carries O(batches x n_polys) rows.
    """
    from ray.data.aggregate import Sum

    from .stages import geo_pipeline

    polys = synth.polygon_arrays()
    pids = np.array([p["poly_id"] for p in polys], dtype=np.int64)
    xmin = np.array([p["bbox"][0] for p in polys])
    ymin = np.array([p["bbox"][1] for p in polys])
    xmax = np.array([p["bbox"][2] for p in polys])
    ymax = np.array([p["bbox"][3] for p in polys])

    ds = geo_pipeline(sf_dir, with_cells=False) \
        .select_columns(["lat", "lon"])

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        # (rows, polys) overlap mask; mirrors the SQL predicate exactly
        hit = ((lat - eps)[:, None] <= ymax[None, :]) \
            & ((lat + eps)[:, None] >= ymin[None, :]) \
            & ((lon - eps)[:, None] <= xmax[None, :]) \
            & ((lon + eps)[:, None] >= xmin[None, :])
        n = hit.sum(axis=0).astype(np.int64)
        keep = n > 0
        return pa.table({"poly_id": pa.array(pids[keep]),
                         "n": pa.array(n[keep])})

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("poly_id").aggregate(Sum("n", alias_name="n_docs"))


# ---------------------------------------------------------------------------
# nearest_poly — nearest-centroid polygon assignment
# ---------------------------------------------------------------------------

def poly_centroid_terms():
    """Exact integer terms ``(poly_id, sum_x_md, sum_y_md, n_vertices)``
    of the vertex-mean centroids, poly_id-ascending.  Both engines
    derive the centroid double as ``(sum_md / 1000.0) / n`` — integer
    literals convert to double exactly and each division is correctly
    rounded, so the constants are bit-identical.  (repr() literals are
    NOT safe: DuckDB parses decimal literals via DECIMAL and the
    DOUBLE cast is off by ulps — measured on this box.)
    """
    rows = []
    for p in sorted(synth.POLYGONS, key=lambda p: p["poly_id"]):
        ring = np.asarray(p["ring_md"], dtype=np.int64)
        rows.append((int(p["poly_id"]), int(ring[:, 0].sum()),
                     int(ring[:, 1].sum()), len(ring)))
    return rows


def poly_centroids():
    """(poly_id, cx, cy) vertex-mean centroids of the synth polygon
    layer, poly_id-ascending (doubles via :func:`poly_centroid_terms`).
    """
    t = poly_centroid_terms()
    pids = np.asarray([r[0] for r in t], dtype=np.int64)
    cxs = np.asarray([float(r[1]) / 1000.0 / r[3] for r in t])
    cys = np.asarray([float(r[2]) / 1000.0 / r[3] for r in t])
    return pids, cxs, cys


def nearest_poly(sf_dir: str):
    """Assign every page to its nearest polygon centroid by squared
    degree distance (ties -> lowest poly_id) and emit the per-page
    assignment ``(doc_id, poly_id, d2)``.  The classic broadcast
    nearest-zone labeling: centroids are a tiny module constant
    (cluster: ``ray.put`` once), the per-batch kernel is one
    (rows x n_polys) vectorized distance matrix + argmin — no shuffle
    at all.
    """
    from .stages import geo_pipeline

    pids, cxs, cys = poly_centroids()

    ds = geo_pipeline(sf_dir, with_cells=False) \
        .select_columns(["doc_id", "lat", "lon"])

    def assign(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        dlat = lat[:, None] - cys[None, :]
        dlon = lon[:, None] - cxs[None, :]
        d2 = dlat * dlat + dlon * dlon
        # centroids are poly_id-ascending, so argmin's first-min rule
        # IS the lowest-poly_id tie-break
        best = np.argmin(d2, axis=1)
        rows = np.arange(len(lat))
        return pa.table({
            "doc_id": batch["doc_id"],
            "poly_id": pa.array(pids[best]),
            "d2": pa.array(d2[rows, best])})

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)
