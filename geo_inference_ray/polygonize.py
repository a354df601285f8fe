"""Mask -> vector polygonization with cross-tile stitching.

Reference behavior: ``rasterio.features.shapes(mask, mask=mask>0)``
groups contiguous (4-connected) equal-valued pixels into polygons with
value>0, then buffer(0) + area filter
(/root/reference/geo_inference/utils/polygon.py:20-71).  The reference
polygonizes the whole raster in one process; at 100 TB the mask is
distributed, so components spanning tile borders must be stitched
(SURVEY §7.7 "hard part").

Distributed design:
1. per mask tile: local 4-connected components of equal class (>0 and
   not nodata); emit component pixel runs + the tile's 4 border strips
   (class + local label per border pixel);
2. border strips of facing tile edges are joined (groupby on the shared
   edge key) -> equivalence pairs ((tile,label) ~ (tile',label'));
3. union-find over the equivalence pairs (driver-side: the pair count is
   bounded by mask-grid perimeter pixels, not input rows) -> global
   component ids, broadcast;
4. groupby(global id) -> assemble the component's pixels, trace boundary
   rings (outer ring + holes, pixel-edge following with interior kept on
   the left), convert to geo coords via the grid affine.

Output: one row per ring: (comp_id, class_id, ring_idx, is_hole,
n_pixels, area_px, xs, ys) with xs/ys in lon/lat degrees.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .tiling import NODATA, GridConfig


# ---------------------------------------------------------------------------
# local connected components (pure numpy two-pass union-find per tile)
# ---------------------------------------------------------------------------

def label_components(mask: np.ndarray) -> np.ndarray:
    """4-connected components of equal value for value>0 and !=NODATA.
    Returns int64 labels, 0 = background; labels are dense 1..K in
    first-encounter (row-major scan) order — the same relative order as
    the per-pixel reference kernel, which downstream comp-id sorting
    relies on.

    Vectorized two-pass: row runs of equal value (numpy break-flag
    cumsum) -> union-find over runs joined by vertical adjacency
    (deduped pair list, bounded by run count, not pixels)."""
    h, w = mask.shape
    fg = (mask > 0) & (mask != NODATA)
    if not fg.any():
        return np.zeros((h, w), dtype=np.int64)
    flat_fg = fg.reshape(-1)
    vals = mask.reshape(-1).astype(np.int64)
    newrow = np.zeros(h * w, dtype=bool)
    newrow[::w] = True
    prev_fg = np.concatenate([[False], flat_fg[:-1]])
    prev_val = np.concatenate([[-1], vals[:-1]])
    start = flat_fg & (newrow | ~prev_fg | (vals != prev_val))
    run_id = np.cumsum(start) * flat_fg  # 0 = background, 1..K scan order
    nruns = int(run_id.max())
    r2 = run_id.reshape(h, w)
    adj = fg[1:, :] & fg[:-1, :] & (mask[1:, :] == mask[:-1, :])
    pa = r2[1:, :][adj]
    pb = r2[:-1, :][adj]
    pairs = np.unique(pa * np.int64(nruns + 1) + pb)
    parent = np.arange(nruns + 1, dtype=np.int64)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for p in pairs.tolist():
        x, y = divmod(p, nruns + 1)
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    roots = parent.copy()
    while True:
        nxt = roots[roots]
        if np.array_equal(nxt, roots):
            break
        roots = nxt
    # densify: min-run-id roots are order-preserving but gapped (a later
    # run merging into an earlier component leaves holes); renumber to
    # honest dense 1..K keeping the ascending (= first-encounter) order
    uniq = np.unique(roots[1:])  # component roots, ascending
    dense = np.zeros(nruns + 1, dtype=np.int64)
    dense[1:] = np.searchsorted(uniq, roots[1:]) + 1
    return dense[run_id].reshape(h, w)


def label_components_ref(mask: np.ndarray) -> np.ndarray:
    """Per-pixel reference kernel (the original implementation) — kept
    for equivalence tests and the vectorization benchmark."""
    h, w = mask.shape
    fg = (mask > 0) & (mask != NODATA)
    labels = np.zeros((h, w), dtype=np.int64)
    parent = [0]

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    for y in range(h):
        for x in range(w):
            if not fg[y, x]:
                continue
            up = labels[y - 1, x] if y and fg[y - 1, x] \
                and mask[y - 1, x] == mask[y, x] else 0
            lf = labels[y, x - 1] if x and fg[y, x - 1] \
                and mask[y, x - 1] == mask[y, x] else 0
            if up and lf:
                labels[y, x] = min(find(up), find(lf))
                union(up, lf)
            elif up or lf:
                labels[y, x] = up or lf
            else:
                labels[y, x] = nxt
                parent.append(nxt)
                nxt += 1
    # second pass: path-compress to roots, densify
    flat = labels.reshape(-1)
    roots = np.array([find(v) if v else 0 for v in flat], dtype=np.int64)
    return roots.reshape(h, w)


# ---------------------------------------------------------------------------
# boundary tracing (pixel-edge following; interior on the left)
# ---------------------------------------------------------------------------

_VBIG = np.int64(1) << np.int64(32)


def trace_rings(pixels: set[tuple[int, int]]):
    """Boundary rings of a 4-connected pixel set (vectorized).

    Pixels are (y, x) cells of unit size; vertices are integer corners.
    Returns list of rings, each a list of (x, y) vertices; ring 0.. may
    include holes (``is_hole`` decided downstream from signed area).

    Array-based: boundary edges from sorted-key membership tests, a
    successor permutation over EDGES (junction vertices resolved by the
    sharpest-right-turn rule per incoming direction), then cycle
    decomposition with vectorized collinear collapse.  Rings are
    enumerated in row-major first-edge order (deterministic by
    construction, unlike the reference kernel's set-iteration order).
    """
    if not pixels:
        return []
    arr = np.array(list(pixels), dtype=np.int64)
    return trace_rings_arrays(arr[:, 0], arr[:, 1])


def trace_rings_arrays(pys: np.ndarray, pxs: np.ndarray):
    """Array-native trace_rings (no set/sort round-trip) — the form the
    pipeline kernels call with the np.nonzero output directly."""
    key = pys * _VBIG + pxs
    order0 = np.argsort(key, kind="stable")  # row-major pixel order
    ys, xs = pys[order0], pxs[order0]
    key = key[order0]

    def member(yy, xx):
        k = yy * _VBIG + xx
        pos = np.clip(np.searchsorted(key, k), 0, len(key) - 1)
        return key[pos] == k

    # directed boundary edges, interior on the LEFT of direction;
    # per-pixel side order (top, bottom, left, right)
    top = ~member(ys - 1, xs)
    bot = ~member(ys + 1, xs)
    lef = ~member(ys, xs - 1)
    rig = ~member(ys, xs + 1)
    msk = np.stack([top, bot, lef, rig], axis=1).reshape(-1)
    SX = np.stack([xs, xs + 1, xs, xs + 1], 1).reshape(-1)[msk]
    SY = np.stack([ys, ys + 1, ys + 1, ys], 1).reshape(-1)[msk]
    EX = np.stack([xs + 1, xs, xs, xs + 1], 1).reshape(-1)[msk]
    EY = np.stack([ys, ys + 1, ys, ys + 1], 1).reshape(-1)[msk]
    m = len(SX)
    skey = SY * _VBIG + SX
    ekey = EY * _VBIG + EX
    order = np.argsort(skey, kind="stable")
    s_sorted = skey[order]
    lo = np.searchsorted(s_sorted, ekey)
    hi = np.searchsorted(s_sorted, ekey, side="right")
    cnt = hi - lo
    dx = EX - SX
    dy = EY - SY
    succ = np.full(m, -1, dtype=np.int64)
    simple = cnt == 1
    succ[simple] = order[lo[simple]]
    for i in np.nonzero(cnt > 1)[0].tolist():
        cand = order[lo[i]:hi[i]]
        turns = dx[i] * dy[cand] - dy[i] * dx[cand]
        succ[i] = cand[int(np.argmin(turns))]
    # the right-turn rule pairs each junction's in-edges with distinct
    # out-edges; a collision would break the permutation
    assert len(np.unique(succ)) == m, "junction pairing collision"
    visited = np.zeros(m, dtype=bool)
    succ_l = succ.tolist()
    sx_l = SX.tolist()
    sy_l = SY.tolist()
    rings = []
    for start_e in range(m):
        if visited[start_e]:
            continue
        vx: list[int] = []
        vy: list[int] = []
        e = start_e
        while not visited[e]:
            visited[e] = True
            vx.append(sx_l[e])
            vy.append(sy_l[e])
            e = succ_l[e]
        X = np.array(vx, dtype=np.int64)
        Y = np.array(vy, dtype=np.int64)
        xp, yp = np.roll(X, 1), np.roll(Y, 1)
        xn, yn = np.roll(X, -1), np.roll(Y, -1)
        keep = (X - xp) * (yn - Y) != (Y - yp) * (xn - X)
        rings.append(list(zip(X[keep].tolist(), Y[keep].tolist())))
    return rings


def trace_rings_ref(pixels: set[tuple[int, int]]):
    """Per-edge dict-walking reference kernel (the original
    implementation) — kept for equivalence tests and the benchmark."""
    # directed boundary edges, interior on the LEFT of direction
    edges = {}  # start vertex -> list of (end vertex)
    for (y, x) in pixels:
        if (y - 1, x) not in pixels:   # top side: left-to-right? interior below
            edges.setdefault((x, y), []).append((x + 1, y))
        if (y + 1, x) not in pixels:   # bottom side: right-to-left
            edges.setdefault((x + 1, y + 1), []).append((x, y + 1))
        if (y, x - 1) not in pixels:   # left side: upwards (y decreasing? )
            edges.setdefault((x, y + 1), []).append((x, y))
        if (y, x + 1) not in pixels:   # right side: downwards
            edges.setdefault((x + 1, y), []).append((x + 1, y + 1))
    rings = []
    while edges:
        start = next(iter(edges))
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            outs = edges[cur]
            if len(outs) == 1:
                nxt = outs.pop()
                del edges[cur]
            elif prev_dir is None:
                # ring starts AT a junction (two loops touching at a
                # corner): deterministic choice; either loop closes
                # consistently from here
                outs.sort()
                nxt = outs.pop(0)
                if not outs:
                    del edges[cur]
            else:
                # junction: with interior-on-left edge orientation the
                # ring must take the sharpest RIGHT turn relative to the
                # incoming direction; a left-turn preference crosses into
                # the adjacent loop at diagonal-pinch junctions and
                # produces self-touching non-simple rings
                def turn_key(cand):
                    dx, dy = cand[0] - cur[0], cand[1] - cur[1]
                    pdx, pdy = prev_dir
                    # right-turn priority: cross product ascending
                    return (pdx * dy - pdy * dx)
                outs.sort(key=turn_key)
                nxt = outs.pop(0)
                if not outs:
                    del edges[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            if nxt == ring[0]:
                break
            ring.append(nxt)
            cur = nxt
        # collapse collinear runs
        out = []
        n = len(ring)
        for i in range(n):
            a, b, c = ring[i - 1], ring[i], ring[(i + 1) % n]
            if (b[0] - a[0]) * (c[1] - b[1]) != (b[1] - a[1]) * (c[0] - b[0]):
                out.append(b)
        rings.append(out)
    return rings


def ring_signed_area(ring) -> float:
    xs = np.array([p[0] for p in ring], dtype=float)
    ys = np.array([p[1] for p in ring], dtype=float)
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    return float(np.sum(xs * y2 - x2 * ys) * 0.5)


# ---------------------------------------------------------------------------
# distributed stitch pipeline
# ---------------------------------------------------------------------------

def _tile_components(tiles_df: pd.DataFrame, stride: int):
    """Per-tile labeling: returns (pixel rows, border rows).

    pixel rows: (tkey, llab, class_id, py, px) absolute pixel coords;
    border rows: (edge_key, side, offset, class_id, tkey, llab).
    tkey = oy * 2**20 + ox; edge_key identifies the shared edge between
    two adjacent tiles (vertical edges keyed by (right-tile), horizontal
    by (below-tile))."""
    prows = []
    brows = []
    s = stride
    for r in tiles_df.itertuples():
        mask = np.asarray(r.mask, dtype=np.uint8).reshape(s, s)
        labs = label_components(mask)
        if not labs.any():
            continue
        tkey = r.oy * (1 << 20) + r.ox
        ys, xs = np.nonzero(labs)
        prows.append(pd.DataFrame({
            "tkey": tkey, "llab": labs[ys, xs],
            "class_id": mask[ys, xs].astype(np.int64),
            "py": r.oy * s + ys, "px": r.ox * s + xs,
        }))
        # border strips: (side 0=top,1=bottom,2=left,3=right)
        for side, (yy, xx) in enumerate([
                (np.zeros(s, int), np.arange(s)),
                (np.full(s, s - 1), np.arange(s)),
                (np.arange(s), np.zeros(s, int)),
                (np.arange(s), np.full(s, s - 1))]):
            lb = labs[yy, xx]
            nz = lb > 0
            if not nz.any():
                continue
            off = np.arange(s)[nz]
            # shared edge key: horizontal edge above row 0 belongs to
            # (oy-1/oy, ox); vertical edge left of col 0 to (oy, ox-1/ox)
            if side == 0:
                ek = (r.oy * 2 + 0) * (1 << 21) + r.ox * 2
            elif side == 1:
                ek = ((r.oy + 1) * 2 + 0) * (1 << 21) + r.ox * 2
            elif side == 2:
                ek = (r.oy * 2 + 1) * (1 << 21) + r.ox * 2
            else:
                ek = (r.oy * 2 + 1) * (1 << 21) + (r.ox + 1) * 2
            brows.append(pd.DataFrame({
                "edge_key": ek, "side": side, "offset": off,
                "class_id": mask[yy, xx][nz].astype(np.int64),
                "tkey": tkey, "llab": lb[nz],
            }))
    prows = pd.concat(prows, ignore_index=True) if prows else pd.DataFrame(
        columns=["tkey", "llab", "class_id", "py", "px"])
    brows = pd.concat(brows, ignore_index=True) if brows else pd.DataFrame(
        columns=["edge_key", "side", "offset", "class_id", "tkey", "llab"])
    return prows, brows


def stitch_polygons(tiles_df: pd.DataFrame, grid: GridConfig,
                    min_area_px: float = 0.0) -> pd.DataFrame:
    """Full polygonize + stitch (driver orchestration; the heavy pixel
    work is per-tile and the equivalence set is perimeter-bounded).

    In the distributed deployment _tile_components runs inside
    map_batches over mask-tile blocks and only the border rows +
    per-component metadata come to the driver; here tiles are already
    small enough to process in-process, which keeps the unit of work
    identical and the stitch logic shared."""
    prows, brows = _tile_components(tiles_df, grid.stride)
    if prows.empty:
        return pd.DataFrame(columns=["comp_id", "class_id", "ring_idx",
                                     "is_hole", "n_pixels", "area_px",
                                     "xs", "ys"])
    # equivalences across facing borders
    parent = {}

    def find(a):
        parent.setdefault(a, a)
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for key in prows.groupby(["tkey", "llab"]).groups:
        find(key)
    for _, g in brows.groupby("edge_key"):
        sides = g["side"].unique()
        if len(sides) < 2:
            continue
        # match top(0) of lower tile with bottom(1) of upper, left(2)
        # with right(3): same offset + same class -> union
        a = g[g["side"].isin([0, 2])]
        b = g[g["side"].isin([1, 3])]
        m = a.merge(b, on="offset", suffixes=("_a", "_b"))
        m = m[m["class_id_a"] == m["class_id_b"]]
        for r in m.itertuples():
            union((r.tkey_a, r.llab_a), (r.tkey_b, r.llab_b))
    # global ids: dense ints in deterministic key order
    roots = {k: find(k) for k in list(parent)}
    uniq = sorted(set(roots.values()))
    gid = {r: i for i, r in enumerate(uniq)}
    prows["comp_id"] = [gid[roots[(t, l)]]
                        for t, l in zip(prows["tkey"], prows["llab"])]
    out = []
    for cid, g in prows.groupby("comp_id"):
        rings = trace_rings_arrays(g["py"].to_numpy(dtype=np.int64),
                                   g["px"].to_numpy(dtype=np.int64))
        # outer ring = largest |signed area|
        areas = [ring_signed_area(rg) for rg in rings]
        outer = int(np.argmax(np.abs(areas)))
        area_px = abs(areas[outer])
        if area_px < min_area_px:
            continue
        for ri, (rg, a) in enumerate(zip(rings, areas)):
            xs = np.array([p[0] for p in rg], dtype=float)
            ys = np.array([p[1] for p in rg], dtype=float)
            lon = grid.min_lon + xs * grid.pix
            lat = grid.max_lat - ys * grid.pix
            out.append({
                "comp_id": cid,
                "class_id": int(g["class_id"].iloc[0]),
                "ring_idx": ri, "is_hole": ri != outer,
                "n_pixels": len(g), "area_px": area_px,
                "xs": lon, "ys": lat,
            })
    return pd.DataFrame(out)


def polygons_from_tiles(tiles_ds, grid: GridConfig,
                        min_area_px: float = 0.0) -> pd.DataFrame:
    """Ray entry: consume the mask-tile Dataset and stitch.  Mask tiles
    are bounded by the raster grid (not the input row count), so
    collecting them to the driver for the stitch is scale-safe for
    coarse grids; :func:`polygons_distributed` is the fine-grid path."""
    return stitch_polygons(tiles_ds.to_pandas(), grid, min_area_px)


def polygons_distributed(tiles_ds, grid: GridConfig,
                         min_area_px: float = 0.0):
    """Fully distributed polygonize + stitch.

    1. map_batches over mask-tile blocks: per-tile component labeling;
       emits pixel rows (stay distributed) and border rows (collected —
       bounded by the mask grid's tile perimeter, not input rows);
    2. driver: border equivalence union-find -> broadcast global-id map;
    3. map_batches: relabel pixel rows with comp_id;
    4. groupby(comp_id).map_groups: assemble pixels, trace rings,
       convert to geo coords.

    Returns a Dataset of ring rows (same schema as stitch_polygons).
    Semantics identical to the driver-side path (pinned by test).
    """
    import ray
    import ray.data as rd

    stride = grid.stride

    # node encoding: (tkey, llab) -> tkey * mult + llab.  llab is dense
    # 1..K per tile with K <= stride^2, so mult = stride^2 + 1 keeps the
    # int64 node order identical to (tkey, llab) tuple order — comp ids
    # match the previous tuple-keyed implementation bit for bit.
    mult = stride * stride + 1

    def tile_stage(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        prows, brows = _tile_components(df, stride)
        # pack three row kinds into one table:
        # kind=0 pixel, 1 border, 2 component registry (one row per
        # distinct (tkey, llab) — lets the driver learn the component
        # universe without ever pulling pixel rows)
        p = pa.table({
            "kind": pa.array(np.zeros(len(prows), dtype=np.int8)),
            "tkey": pa.array(prows["tkey"].to_numpy(dtype=np.int64)),
            "llab": pa.array(prows["llab"].to_numpy(dtype=np.int64)),
            "class_id": pa.array(prows["class_id"].to_numpy(dtype=np.int64)),
            "a": pa.array(prows["py"].to_numpy(dtype=np.int64)),
            "b": pa.array(prows["px"].to_numpy(dtype=np.int64)),
        })
        q = pa.table({
            "kind": pa.array(np.ones(len(brows), dtype=np.int8)),
            "tkey": pa.array(brows["tkey"].to_numpy(dtype=np.int64)),
            "llab": pa.array(brows["llab"].to_numpy(dtype=np.int64)),
            "class_id": pa.array(brows["class_id"].to_numpy(dtype=np.int64)),
            "a": pa.array((brows["edge_key"].to_numpy(dtype=np.int64) * 4
                           + brows["side"].to_numpy(dtype=np.int64))),
            "b": pa.array(brows["offset"].to_numpy(dtype=np.int64)),
        })
        reg = prows[["tkey", "llab"]].drop_duplicates()
        z = np.zeros(len(reg), dtype=np.int64)
        r = pa.table({
            "kind": pa.array(np.full(len(reg), 2, dtype=np.int8)),
            "tkey": pa.array(reg["tkey"].to_numpy(dtype=np.int64)),
            "llab": pa.array(reg["llab"].to_numpy(dtype=np.int64)),
            "class_id": pa.array(z), "a": pa.array(z), "b": pa.array(z),
        })
        return pa.concat_tables([p, q, r])

    labeled = tiles_ds.map_batches(tile_stage, batch_format="pyarrow") \
                      .materialize()

    # driver combine, all vectorized (the grid-bounded small side:
    # border + registry rows only — pixel payload is dropped remotely
    # and never crosses to the driver)
    def drop_pixels(bt: pa.Table) -> pa.Table:
        return bt.filter(pa.array(np.asarray(bt["kind"]) != 0))

    sm = labeled.map_batches(drop_pixels,
                             batch_format="pyarrow").to_pandas()
    reg = sm[sm["kind"] == 2]
    nodes = np.unique(reg["tkey"].to_numpy() * mult
                      + reg["llab"].to_numpy())
    parent = np.arange(len(nodes), dtype=np.int64)

    bdf = sm[sm["kind"] == 1].copy()
    if len(bdf):
        bdf["edge_key"] = bdf["a"] // 4
        bdf["side"] = bdf["a"] % 4
        bdf["offset"] = bdf["b"]
        # ONE vectorized self-merge replaces the per-edge_key groupby
        # loop (the former driver hot spot on many-component masks)
        x = bdf[bdf["side"].isin([0, 2])]
        y = bdf[bdf["side"].isin([1, 3])]
        m = x.merge(y, on=["edge_key", "offset"], suffixes=("_a", "_b"))
        m = m[m["class_id_a"] == m["class_id_b"]]
        if len(m):
            ia = np.searchsorted(nodes, m["tkey_a"].to_numpy() * mult
                                 + m["llab_a"].to_numpy())
            ib = np.searchsorted(nodes, m["tkey_b"].to_numpy() * mult
                                 + m["llab_b"].to_numpy())
            # min-label propagation to fixpoint (<= log(diameter)
            # rounds; edge pairs are grid-perimeter-bounded)
            while True:
                ra, rb = parent[ia], parent[ib]
                lo = np.minimum(ra, rb)
                np.minimum.at(parent, ia, lo)
                np.minimum.at(parent, ib, lo)
                nxt = parent[parent]
                while not np.array_equal(nxt, parent):
                    parent = nxt
                    nxt = parent[parent]
                if np.array_equal(parent[ia], parent[ib]):
                    break
    # dense global ids in ascending root order == ascending (tkey, llab)
    # order of each component's minimal member (unchanged semantics)
    uroot = np.unique(parent)
    gid = np.searchsorted(uroot, parent)
    nodes_ref = ray.put(nodes)
    gid_ref = ray.put(gid)

    class Relabel:
        def __init__(self):
            self.nodes = ray.get(nodes_ref)
            self.gid = ray.get(gid_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = np.asarray(batch["kind"]) == 0
            m = batch.filter(pa.array(keep))
            node = (np.asarray(m["tkey"], dtype=np.int64) * mult
                    + np.asarray(m["llab"], dtype=np.int64))
            comp = self.gid[np.searchsorted(self.nodes, node)]
            return pa.table({
                "comp_id": pa.array(comp),
                "class_id": m["class_id"],
                "py": m["a"], "px": m["b"],
            })

    from .pools import pool_caps

    pixels = labeled.map_batches(Relabel, batch_format="pyarrow",
                                 concurrency=pool_caps(None))

    def _empty_rings() -> pd.DataFrame:
        return pd.DataFrame({
            "comp_id": pd.Series([], dtype=np.int64),
            "class_id": pd.Series([], dtype=np.int64),
            "ring_idx": pd.Series([], dtype=np.int64),
            "is_hole": pd.Series([], dtype=bool),
            "n_pixels": pd.Series([], dtype=np.int64),
            "area_px": pd.Series([], dtype=float),
            "xs": pd.Series([], dtype=object),
            "ys": pd.Series([], dtype=object)})

    def trace_part(g: pd.DataFrame) -> pd.DataFrame:
        """Ring tracing for EVERY component in the hash partition (one
        pandas call per partition, not per component — a sliver-heavy
        fine-grid mask has millions of tiny components, which is the
        per-group-call trap this repo eliminates everywhere else).
        Tracing itself is inherently per-component; the loop body is
        the numpy ring tracer over that component's pixel slice."""
        g = g.sort_values("comp_id", kind="stable").reset_index(drop=True)
        cids = g["comp_id"].to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = cids[1:] != cids[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.concatenate([starts, [len(g)]]))
        py = g["py"].to_numpy(dtype=np.int64)
        px = g["px"].to_numpy(dtype=np.int64)
        cls = g["class_id"].to_numpy()
        # vectorized fast path: a 1-pixel component's only ring is the
        # unit square [(x,y),(x+1,y),(x+1,y+1),(x,y+1)], area 1 — no
        # tracer call.  Sliver-heavy masks are mostly this case (the
        # 262k-component bench spends ~240 us per tracer call, ~62 s
        # single-threaded, vs ~0.1 s here).
        single = sizes == 1
        parts = []
        if bool(single.any()) and min_area_px <= 1.0:
            si = starts[single]
            fx = px[si].astype(float)
            fy = py[si].astype(float)
            xs4 = grid.min_lon + np.stack(
                [fx, fx + 1.0, fx + 1.0, fx], axis=1) * grid.pix
            ys4 = grid.max_lat - np.stack(
                [fy, fy, fy + 1.0, fy + 1.0], axis=1) * grid.pix
            n1 = len(si)
            parts.append(pd.DataFrame({
                "comp_id": cids[si].astype(np.int64),
                "class_id": cls[si].astype(np.int64),
                "ring_idx": np.zeros(n1, dtype=np.int64),
                "is_hole": np.zeros(n1, dtype=bool),
                "n_pixels": np.ones(n1, dtype=np.int64),
                "area_px": np.ones(n1, dtype=float),
                "xs": list(xs4), "ys": list(ys4)}))
        starts = starts[~single]
        sizes = sizes[~single]

        rows = []
        for st, sz in zip(starts.tolist(), sizes.tolist()):
            rings = trace_rings_arrays(py[st:st + sz], px[st:st + sz])
            areas = [ring_signed_area(r) for r in rings]
            outer = int(np.argmax(np.abs(areas)))
            area_px = abs(areas[outer])
            if area_px < min_area_px:
                continue
            for ri, rg in enumerate(rings):
                xs = np.array([p[0] for p in rg], dtype=float)
                ys = np.array([p[1] for p in rg], dtype=float)
                rows.append({
                    "comp_id": int(cids[st]),
                    "class_id": int(cls[st]),
                    "ring_idx": ri, "is_hole": ri != outer,
                    "n_pixels": int(sz), "area_px": area_px,
                    "xs": grid.min_lon + xs * grid.pix,
                    "ys": grid.max_lat - ys * grid.pix,
                })
        if rows:
            parts.append(pd.DataFrame(rows))
        if not parts:
            return _empty_rings()
        return pd.concat(parts, ignore_index=True)

    from .relational import _hash_partitioned

    # pixel volume is bounded by the labeled table (materialized above,
    # so the count is free metadata)
    return _hash_partitioned(pixels, "comp_id", trace_part,
                             rows_hint=max(1, labeled.count()))
