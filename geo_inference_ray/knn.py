"""Cell-local kNN over the geocoded pages (north-rule operator) and
skew-aware groupby-cell aggregation.

kNN semantics: for each page, the k nearest other pages *within the same
hex7 cell* (planar squared-degree distance), rank ties broken by
neighbor doc_id.  This is the "cell-local kNN over sorted H3 rings" of
the north rule restricted to ring-0; the ring>0 extension re-keys each
point to its neighbor cells via flat_map (same groupby machinery).

SQL oracle: a self-join on hex7 with ROW_NUMBER() OVER (PARTITION BY
doc_id ORDER BY d2, neighbor) — distances are computed with the exact
same float expression on both sides, so ranks agree bitwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

K_DEFAULT = 5


def knn_in_cells(ds, k: int = K_DEFAULT):
    """ds: Dataset with (doc_id, lat, lon, hex7, ...) ->
    (doc_id, neighbor_id, rank) within-cell kNN.

    groupby(hex7).map_groups with a vectorized pairwise kernel per cell.
    Hot cells (the skew story) are bounded here by the cluster jitter; at
    scale the pre-pass in shuffle.py splits oversized cells by salting and
    merges sub-results (k-way merge of partial top-k lists).
    """
    proj = ds.select_columns(["doc_id", "lat", "lon", "hex7"])

    def cell_knn(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < 2:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "neighbor_id": pd.Series([], dtype=np.int64),
                                 "rank": pd.Series([], dtype=np.int64)})
        ids = g["doc_id"].to_numpy()
        lat = g["lat"].to_numpy()
        lon = g["lon"].to_numpy()
        # pairwise squared distance, same expression as SQL:
        # (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon)
        dlat = lat[:, None] - lat[None, :]
        dlon = lon[:, None] - lon[None, :]
        d2 = dlat * dlat + dlon * dlon
        kk = min(k, n - 1)
        # order by (d2, neighbor_id), excluding self
        nbr_order = np.argsort(ids, kind="stable")
        out_doc = np.empty(n * kk, dtype=np.int64)
        out_nbr = np.empty(n * kk, dtype=np.int64)
        out_rank = np.empty(n * kk, dtype=np.int64)
        # lexsort per row: primary d2, secondary neighbor id
        ids_sorted_idx = np.argsort(ids, kind="stable")
        for i in range(n):
            d = d2[i].copy()
            d[i] = np.inf  # exclude self
            sel = np.lexsort((ids, d))[:kk]
            out_doc[i * kk:(i + 1) * kk] = ids[i]
            out_nbr[i * kk:(i + 1) * kk] = ids[sel]
            out_rank[i * kk:(i + 1) * kk] = np.arange(1, kk + 1)
        return pd.DataFrame({"doc_id": out_doc, "neighbor_id": out_nbr,
                             "rank": out_rank})

    return proj.groupby("hex7").map_groups(cell_knn, batch_format="pandas")


def cell_aggregate(ds):
    """Per-hex7-cell aggregate with map-side partial aggregation.

    Emits (hex7, n_pages, n_langs... ) — partial counts are combined
    inside map_batches first so the groupby shuffles one row per
    (cell, batch) instead of one per page (SURVEY §7.4: push aggregation
    partial before the wide shuffle).  Counts are integers -> the DuckDB
    oracle hash is exact.
    """
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        h = batch["hex7"].to_numpy()
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        cells, inv = np.unique(h, return_inverse=True)
        cnt = np.bincount(inv)
        mnlat = np.full(len(cells), np.inf)
        mxlat = np.full(len(cells), -np.inf)
        mnlon = np.full(len(cells), np.inf)
        mxlon = np.full(len(cells), -np.inf)
        np.minimum.at(mnlat, inv, lat)
        np.maximum.at(mxlat, inv, lat)
        np.minimum.at(mnlon, inv, lon)
        np.maximum.at(mxlon, inv, lon)
        return pa.table({
            "hex7": pa.array(cells), "pc": pa.array(cnt.astype(np.int64)),
            "mnlat": pa.array(mnlat), "mxlat": pa.array(mxlat),
            "mnlon": pa.array(mnlon), "mxlon": pa.array(mxlon),
        })

    partials = ds.select_columns(["hex7", "lat", "lon"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("hex7").aggregate(
        Sum("pc", alias_name="n_pages"),
        Min("mnlat", alias_name="min_lat"), Max("mxlat", alias_name="max_lat"),
        Min("mnlon", alias_name="min_lon"), Max("mxlon", alias_name="max_lon"),
    )
