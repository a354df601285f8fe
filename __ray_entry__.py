"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Every float the engine emits is computed with the exact same IEEE-754
expression order as its SQL mirror (see geo_inference_ray/synth.py), so
value hashes match bitwise; aggregate outputs are integers (counts,
milli-units, cents) wherever a float sum would be order-dependent.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from geo_inference_ray import ann as _ann
from geo_inference_ray import dedup as _dedup
from geo_inference_ray import geoext as _gx_mod
from geo_inference_ray import graph as _graph
from geo_inference_ray import knn as _knn
from geo_inference_ray import analytics as _an_mod
from geo_inference_ray import relational as _rel_mod
from geo_inference_ray import stages as _stages
from geo_inference_ray import synth as _synth
from geo_inference_ray import textops as _textops
from geo_inference_ray.shuffle import MAX_SALTS as _MAX_SALTS

# ---------------------------------------------------------------------------
# SQL building blocks
# ---------------------------------------------------------------------------

_W = "WITH " + _synth.SQL_PAGES
_WG = _W + "," + _synth.SQL_GEO
# RECURSIVE variant for oracles with a recursive CTE (DuckDB accepts
# non-recursive CTEs under WITH RECURSIVE)
_WGR = "WITH RECURSIVE " + _synth.SQL_PAGES + "," + _synth.SQL_GEO
_WH = _WG + "," + _synth.sql_hex_chain()
_WP = _WH + "," + _synth.sql_polygon_edges() + """,
pip AS (
  SELECT g.*, p.poly_id, p.class_id
  FROM hex9 g, polys p
  WHERE (SELECT count(*) FROM edges e
         WHERE e.poly_id = p.poly_id
           AND ((e.ey1 > g.lat) != (e.ey2 > g.lat))
           AND g.lon < (e.ex2 - e.ex1) * (g.lat - e.ey1) / (e.ey2 - e.ey1) + e.ex1
        ) % 2 = 1
)"""


def _langid_scores_sql() -> str:
    score_cols = []
    for lang in _textops.LANG_ORDER:
        terms = []
        for w in _textops.LANG_MARKERS[lang]:
            m = f" {w} "
            terms.append(
                f"(length(padded) - length(replace(padded, '{m}', ''))) // {len(m)}")
        score_cols.append(" + ".join(terms) + f" AS score_{lang}")
    return ", ".join(score_cols)


def _tiling_sql_mask_tiles() -> str:
    from geo_inference_ray.tiling import sql_mask_tiles

    return sql_mask_tiles()


def _tiling_sql_tile_pyramid() -> str:
    from geo_inference_ray.tiling import sql_tile_pyramid

    return sql_tile_pyramid()


def _tiling_sql_pix_cte() -> str:
    from geo_inference_ray.tiling import sql_pix_cte

    return sql_pix_cte()


def _tiling_sql_zonal_stats() -> str:
    from geo_inference_ray.tiling import sql_zonal_stats

    return sql_zonal_stats()


def _tiling_sql_polygon_components() -> str:
    from geo_inference_ray.tiling import sql_polygon_components

    return sql_polygon_components()


def _tiling_sql_polygon_rings() -> str:
    from geo_inference_ray.tiling import sql_polygon_rings

    return sql_polygon_rings()


def _tiling_sql_yolo() -> str:
    from geo_inference_ray.tiling import sql_yolo

    return sql_yolo()


def _tiling_sql_coco() -> str:
    from geo_inference_ray.tiling import sql_coco_annotations

    return sql_coco_annotations()


def _tiling_sql_polygons() -> str:
    from geo_inference_ray.tiling import sql_polygons

    return sql_polygons()


def _pool_caps(max_actors):
    from geo_inference_ray.pools import pool_caps

    return pool_caps(max_actors)


def _docs_text(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_pages(sf_dir: str):
    return _synth.pages_dataset(sf_dir, include_html=False)


def q_extract_text(sf_dir: str):
    ds = _synth.pages_dataset(sf_dir)
    ds = ds.map_batches(_stages.ExtractText, batch_format="pyarrow",
                        zero_copy_batch=True, concurrency=_pool_caps(None))
    return ds.select_columns(["url", "doc_id", "text"])


def q_geocode(sf_dir: str):
    ds = _stages.geo_pipeline(sf_dir, with_cells=False)
    return ds.select_columns(["url", "doc_id", "cluster", "lat", "lon"])


def q_hex_cells(sf_dir: str):
    ds = _stages.geo_pipeline(sf_dir)
    return ds.select_columns(["doc_id", "hex7", "hex9"])


def q_s2_cells(sf_dir: str):
    ds = _stages.geo_pipeline(sf_dir)
    return ds.select_columns(["doc_id", "s2_12"])


def q_pip_inner(sf_dir: str):
    ds = _stages.geo_pipeline(sf_dir, mode="inner")
    return ds.select_columns(["url", "doc_id", "lat", "lon", "hex7",
                              "poly_id", "class_id"])


def q_pip_semi(sf_dir: str):
    ds = _stages.geo_pipeline(sf_dir, mode="semi")
    return ds.select_columns(["doc_id", "lat", "lon"])


def q_pip_left(sf_dir: str):
    ds = _stages.geo_pipeline(sf_dir, mode="left")
    return ds.select_columns(["doc_id", "poly_id"])


def q_cell_agg(sf_dir: str):
    return _knn.cell_aggregate(_stages.geo_pipeline(sf_dir))


def q_knn_cell(sf_dir: str):
    return _knn.knn_in_cells(_stages.geo_pipeline(sf_dir))


def q_knn_ring1(sf_dir: str):
    return _knn.knn_in_cells(_stages.geo_pipeline(sf_dir), ring=1)


def q_dedup_exact(sf_dir: str):
    return _dedup.exact_dedup(_docs_text(sf_dir))


def q_minhash_verified(sf_dir: str):
    """MinHash-LSH candidates verified with exact shingle Jaccard —
    distributed: only candidate doc IDS (ints) touch the driver; shingle
    arrays are computed per batch and hash-joined to the pairs."""
    pairs = _dedup.minhash_candidates(_docs_text(sf_dir))
    return _dedup.jaccard_pairs(pairs, _docs_text(sf_dir))


def q_boiler_score(sf_dir: str):
    """Per-doc boilerplate fraction vs the corpus-wide hot-shingle set
    (df >= BOILER_MIN_DF) — the template/chrome signal for quality
    filtering."""
    import pyarrow.parquet as _pq

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _textops.boiler_score(_docs_text(sf_dir), rows_hint=n)


def q_kmv_distinct(sf_dir: str):
    """Per-source bottom-k (KMV) distinct-shingle sketch with the
    (k-1)*M // h_k estimator — the mergeable set-sketch complement to
    the HLL register family."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    return _dedup.kmv_distinct(docs)


def q_containment_pairs(sf_dir: str):
    """Asymmetric shingle containment per LSH candidate pair — the
    quote/inclusion signal (short doc embedded in a long one) that
    symmetric Jaccard misses."""
    pairs = _dedup.minhash_candidates(_docs_text(sf_dir))
    return _dedup.containment_pairs(pairs, _docs_text(sf_dir))


def q_span_dedup(sf_dir: str):
    """CDC duplicated-span removal: every content chunk keeps one
    canonical occurrence corpus-wide; documents are rewritten."""
    import pyarrow.parquet as _pq

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _textops.span_dedup(_docs_text(sf_dir), rows_hint=n)


def q_zonemap_range(sf_dir: str):
    """Zone-map pruned latitude-range scan: banded parquet layout +
    footer-stats pruning must return exactly the full-scan filter."""
    from geo_inference_ray.checkpoint import zonemap_range_query

    return zonemap_range_query(sf_dir, 5.0, 48.0)


def q_mutual_knn(sf_dir: str):
    """Mutual-kNN graph: (a, b) kept only when each is in the other's
    cell-local top-k."""
    return _knn.mutual_knn(_stages.geo_pipeline(sf_dir))


def q_novelty_docs(sf_dir: str):
    """Incremental-crawl novelty: newest-source docs with no verified
    cross-source near-dup."""
    import pyarrow.parquet as _pq
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    pairs = _dedup.minhash_candidates(_docs_text(sf_dir))
    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _dedup.novelty_docs(docs, pairs, rows_hint=n)


def q_minhash_est(sf_dir: str):
    """Sketch calibration: MinHash-estimated vs exact Jaccard per LSH
    candidate pair."""
    pairs = _dedup.minhash_candidates(_docs_text(sf_dir))
    return _dedup.minhash_estimate(pairs, _docs_text(sf_dir))


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking duplicate-span table: rolling-hash
    (token 3-gram) boundaries, order-independent chunk identity."""
    return _textops.cdc_chunks(_docs_text(sf_dir))


def q_dedup_best(sf_dir: str):
    """Quality-based cluster representative: keep the most-characters
    member of every near-dup cluster (ties -> min doc_id)."""
    import pyarrow.parquet as _pq

    pairs = _dedup.minhash_candidates(_docs_text(sf_dir))
    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _dedup.dedup_best(_docs_text(sf_dir), pairs, rows_hint=n)


def q_poly_geom(sf_dir: str):
    """Integer vector-geometry measures (shoelace area2, L1 perimeter,
    envelope) per polygon of the broadcast layer, joined with the
    distributed PIP page count."""
    return _gx_mod.poly_geometry(sf_dir)


def q_ppjoin_pairs(sf_dir: str):
    """Exact set-similarity self-join (AllPairs/PPJoin prefix filter):
    every pair with shingle Jaccard >= 0.5, recall 1.0 by construction
    — the deterministic counterpart of the MinHash candidate path."""
    return _dedup.ppjoin_pairs(_docs_text(sf_dir))


def q_polygons(sf_dir: str):
    from geo_inference_ray import tiling as _tiling
    from geo_inference_ray.polygonize import polygons_from_tiles

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    tiles = _tiling.mask_tiles(geo, _tiling.DEFAULT_GRID)
    polys = polygons_from_tiles(tiles, _tiling.DEFAULT_GRID)
    return polys[["comp_id", "class_id", "ring_idx", "is_hole",
                  "n_pixels"]]


def q_yolo(sf_dir: str):
    from geo_inference_ray import tiling as _tiling
    from geo_inference_ray.annotations import to_yolo
    from geo_inference_ray.polygonize import polygons_from_tiles

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    tiles = _tiling.mask_tiles(geo, _tiling.DEFAULT_GRID)
    polys = polygons_from_tiles(tiles, _tiling.DEFAULT_GRID)
    return to_yolo(polys, _tiling.DEFAULT_GRID)


def q_coco_annotations(sf_dir: str):
    import pandas as pd

    from geo_inference_ray import tiling as _tiling
    from geo_inference_ray.annotations import to_coco
    from geo_inference_ray.polygonize import polygons_from_tiles

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    tiles = _tiling.mask_tiles(geo, _tiling.DEFAULT_GRID)
    polys = polygons_from_tiles(tiles, _tiling.DEFAULT_GRID)
    coco = to_coco(polys, _tiling.DEFAULT_GRID)
    return pd.DataFrame([{ "id": a["id"], "category_id": a["category_id"],
                           "area": a["area"], "iscrowd": a["iscrowd"]}
                         for a in coco["annotations"]])


def q_polygons_dist(sf_dir: str):
    """Fully distributed polygonize (map_batches labeling + bounded
    border union-find + groupby ring assembly)."""
    from geo_inference_ray import tiling as _tiling
    from geo_inference_ray.polygonize import polygons_distributed

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    tiles = _tiling.mask_tiles(geo, _tiling.DEFAULT_GRID)
    ds = polygons_distributed(tiles, _tiling.DEFAULT_GRID)
    return ds.select_columns(["comp_id", "class_id", "ring_idx",
                              "is_hole", "n_pixels"])


def q_polygon_components(sf_dir: str):
    """Per-component polygonize output (one row per connected component)
    — the SQL-expressible core of the polygon chain (component
    structure, class, pixel count); ring tracing stays pinned by golden
    + property tests."""
    from geo_inference_ray import tiling as _tiling
    from geo_inference_ray.polygonize import polygons_from_tiles

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    tiles = _tiling.mask_tiles(geo, _tiling.DEFAULT_GRID)
    polys = polygons_from_tiles(tiles, _tiling.DEFAULT_GRID)
    comp = polys.drop_duplicates("comp_id")[
        ["comp_id", "class_id", "n_pixels"]].reset_index(drop=True)
    return comp.astype({"comp_id": "int64", "class_id": "int64",
                        "n_pixels": "int64"})


def q_polygon_rings(sf_dir: str):
    """Per-component RING structure (ring/hole counts + outer area) —
    SQL-expressible via the background-cavity equivalence (a hole is an
    enclosed 4-connected background cavity)."""
    import pandas as pd

    from geo_inference_ray import tiling as _tiling
    from geo_inference_ray.polygonize import polygons_from_tiles

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    tiles = _tiling.mask_tiles(geo, _tiling.DEFAULT_GRID)
    polys = polygons_from_tiles(tiles, _tiling.DEFAULT_GRID)
    g = polys.groupby("comp_id", as_index=False).agg(
        class_id=("class_id", "first"), n_pixels=("n_pixels", "first"),
        n_rings=("ring_idx", "size"), n_holes=("is_hole", "sum"))
    outer = polys[~polys["is_hole"]].set_index("comp_id")["area_px"]
    g["area_px_int"] = g["comp_id"].map(outer).round().astype("int64")
    return g.astype({"comp_id": "int64", "class_id": "int64",
                     "n_pixels": "int64", "n_rings": "int64",
                     "n_holes": "int64"})


def q_manifest(sf_dir: str):
    from geo_inference_ray.sources import manifest

    return manifest(sf_dir)


def q_media_features(sf_dir: str):
    from geo_inference_ray import multimodal as _mm

    ds = _mm.media_features(sf_dir)
    return ds.select_columns(["id", "kind"])


def q_image_thumbs(sf_dir: str):
    from geo_inference_ray import multimodal as _mm

    return _mm.image_thumbs(sf_dir)


def q_media_frames(sf_dir: str):
    from geo_inference_ray import multimodal as _mm

    return _mm.media_frames(sf_dir).select_columns(["id", "frame_idx"])


def q_token_count(sf_dir: str):
    return _docs_text(sf_dir).map_batches(
        _textops.token_count, batch_format="pyarrow", zero_copy_batch=True)


def q_token_regex(sf_dir: str):
    return _docs_text(sf_dir).map_batches(
        _textops.RegexTokens, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=_pool_caps(None))


def q_quality(sf_dir: str):
    return _docs_text(sf_dir).map_batches(
        _textops.quality_score, batch_format="pyarrow", zero_copy_batch=True)


def q_langid(sf_dir: str):
    return _docs_text(sf_dir).map_batches(
        _textops.LangId, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=_pool_caps(None))


def q_word_count(sf_dir: str):
    return _textops.word_count_topk(_docs_text(sf_dir))


def q_repetition(sf_dir: str):
    return _docs_text(sf_dir).map_batches(
        _dedup.RepetitionRatio, batch_format="pyarrow",
        zero_copy_batch=True, concurrency=_pool_caps(None))


def q_source_stats(sf_dir: str):
    return _textops.source_stats(_synth.pages_dataset(sf_dir,
                                                      include_html=False))


def q_host_stats(sf_dir: str):
    return _textops.host_stats(_synth.pages_dataset(sf_dir,
                                                    include_html=False))


def q_ccnet_buckets(sf_dir: str):
    return _textops.ccnet_buckets(_docs_text(sf_dir))


def q_dup_spans(sf_dir: str):
    import pyarrow.parquet as _pq

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _textops.dup_spans(_docs_text(sf_dir), docs_hint=n)


def q_mix_sample(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source"])
    return _textops.mix_sample(ds)


def q_cms_heavy(sf_dir: str):
    return _textops.cms_heavy(_docs_text(sf_dir))


def q_weighted_sample(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.weighted_sample(sf_dir)


def q_dedup_clusters(sf_dir: str):
    pairs = _dedup.minhash_candidates(_docs_text(sf_dir))
    return _dedup.dedup_clusters(_docs_text(sf_dir), pairs)


def q_dedup_apply(sf_dir: str):
    import ray.data as rd

    import pyarrow.parquet as _pq

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    pairs = _dedup.minhash_candidates(_docs_text(sf_dir))
    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _dedup.dedup_apply(docs, pairs, rows_hint=n)


def q_length_quantiles(sf_dir: str):
    return _textops.length_quantiles(_docs_text(sf_dir))


def q_ngram_topk(sf_dir: str):
    return _textops.ngram_topk(_docs_text(sf_dir))


def q_chunk_docs(sf_dir: str):
    return _textops.chunk_docs(_docs_text(sf_dir))


def q_pack_sequences(sf_dir: str):
    return _textops.pack_sequences(_docs_text(sf_dir))


def q_tfidf_topk(sf_dir: str):
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _textops.tfidf_topk(_docs_text(sf_dir), n_docs)


def q_surprisal(sf_dir: str):
    return _textops.unigram_surprisal(_docs_text(sf_dir))


def q_bigram_surprisal(sf_dir: str):
    import pyarrow.parquet as _pq

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _textops.bigram_surprisal(_docs_text(sf_dir),
                                     rows_hint=n * 64)


def q_decontaminate(sf_dir: str):
    return _textops.decontaminate(_docs_text(sf_dir))


def q_chunk_dedup(sf_dir: str):
    return _textops.chunk_dedup(_docs_text(sf_dir))


def q_quality_filter(sf_dir: str):
    return _textops.quality_filter(_docs_text(sf_dir))


def q_inverted_index(sf_dir: str):
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _textops.inverted_index(_docs_text(sf_dir),
                                   rows_hint=n_docs * 64)


def q_train_shuffle(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.train_shuffle(sf_dir)


def q_stratified_sample(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.stratified_sample(sf_dir)


def q_fingerprint(sf_dir: str):
    return _docs_text(sf_dir).map_batches(
        _textops.Fingerprint, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=_pool_caps(None))


def q_rasterize(sf_dir: str):
    from geo_inference_ray import tiling as _tiling

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    return _tiling.pixel_counts(geo, _tiling.DEFAULT_GRID)


def q_mask_tiles(sf_dir: str):
    from geo_inference_ray import tiling as _tiling

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    tiles = _tiling.mask_tiles(geo, _tiling.DEFAULT_GRID)
    return tiles.select_columns(["oy", "ox", "n_valid"])


def q_tile_pyramid(sf_dir: str):
    from geo_inference_ray import tiling as _tiling

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    return _tiling.tile_pyramid(geo, _tiling.DEFAULT_GRID)


def q_zonal_stats(sf_dir: str):
    from geo_inference_ray import tiling as _tiling

    geo = _stages.geo_pipeline(sf_dir, with_cells=False)
    return _tiling.zonal_stats(geo, _tiling.DEFAULT_GRID)


def q_ann_topk(sf_dir: str):
    return _ann.ann_topk(sf_dir)


def q_sq_topk(sf_dir: str):
    return _ann.sq_topk(sf_dir)


def q_ivf_topk(sf_dir: str):
    """IVF-probed approximate ANN (coarse quantizer + nprobe cells) —
    the scale path next to the exact brute-force baseline.  Approximate
    but fully deterministic (first-n centroids, rank-only output), so
    it carries an exact SQL oracle; recall vs ann_topk pinned by
    test."""
    return _ann.ivf_topk(sf_dir)


def q_minhash_pairs(sf_dir: str):
    return _dedup.minhash_candidates(_docs_text(sf_dir))


def q_simhash(sf_dir: str):
    return _dedup.simhash_table(_docs_text(sf_dir))


def q_embedding_near_dup(sf_dir: str):
    """Near-dup pair set only: sim_milli stays in the library API but
    is projected out of the checked contract — its last digit sits on a
    float64 truncation boundary that the engine (normalize-then-matmul)
    and DuckDB (list_cosine_similarity) can round differently, while
    the pair SET is ULP-robust (no observed boundary at any sf)."""
    return _ann.embedding_near_dup(sf_dir).select_columns(
        ["vec_a", "vec_b"])


def q_pricing_summary(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.pricing_summary(sf_dir)


def q_top_customers(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.top_customers(sf_dir)


def q_bucketed_join(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.bucketed_join_agg(sf_dir)


def q_top_orders_per_customer(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.top_orders_per_customer(sf_dir)


def q_events_hourly(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.events_hourly(sf_dir)


def q_sessionize(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.sessionize(sf_dir)


def q_asof_prior_anchor(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.asof_prior_anchor(sf_dir)


def q_anchor_window_follow(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.anchor_window_follow(sf_dir)


def q_native_join(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.native_join_agg(sf_dir)


def q_simhash_pairs(sf_dir: str):
    import pyarrow.parquet as _pq

    n = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return _dedup.simhash_pairs(_docs_text(sf_dir), rows_hint=n)


def q_bloom_probe(sf_dir: str):
    return _dedup.bloom_probe(_docs_text(sf_dir))


def q_hll_registers(sf_dir: str):
    return _dedup.hll_registers(_docs_text(sf_dir))


def q_kmeans(sf_dir: str):
    return _ann.kmeans_assign(sf_dir)


def q_pip_count_by_poly(sf_dir: str):
    """Join + aggregate composition: hits per polygon."""
    from ray.data.aggregate import Count

    ds = _stages.geo_pipeline(sf_dir, mode="inner")
    return ds.select_columns(["poly_id"]).groupby("poly_id").aggregate(
        Count(alias_name="n_hits"))


def q_events_rollup(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.events_rollup(sf_dir)


def q_distinct_users(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.distinct_users(sf_dir)


def q_length_rank(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.length_percentile_rank(sf_dir)


def q_funnel(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.funnel_stages(sf_dir)


def q_multi_source(sf_dir: str):
    """S3 seam exercised end-to-end: two per-source reads assembled
    into one logical dataset by sources.union_sources (the STAC
    per-band union analog), then a grouped aggregate."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from geo_inference_ray.sources import union_sources

    u = union_sources([sf_dir, sf_dir], columns=["text", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "lang": batch["lang"],
            "nch": pc.cast(pc.utf8_length(batch["text"]), pa.int64())})
        g = t.group_by("lang").aggregate([("nch", "sum"),
                                          ("nch", "count")])
        return pa.table({"lang": g["lang"], "tc": g["nch_sum"],
                         "n": pc.cast(g["nch_count"], pa.int64())})

    return u.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None)         .groupby("lang").aggregate(Sum("tc", alias_name="total_chars"),
                                   Sum("n", alias_name="n_docs"))


def q_hash_sample(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.hash_sample(sf_dir)


def q_stac_union(sf_dir: str):
    """S3 via the REAL STAC walker: a static catalog (two items whose
    assets are the same documents.parquet — href resolution + union
    through StacCatalogSource) feeds the per-url text-length rollup.
    The catalog JSON lives at a DETERMINISTIC per-sf_dir /tmp path,
    built once and reused (an mkdtemp per call leaked a scratch dir
    per invocation; the catalog must outlive this function because the
    returned Dataset reads it lazily)."""
    import hashlib
    import json
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    from geo_inference_ray.sources import get_source

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = f"/tmp/stac_q_cache/{tag}"
    cat = os.path.join(d, "catalog.json")
    if not os.path.exists(cat):
        os.makedirs(d, exist_ok=True)
        for i in (1, 2):
            with open(os.path.join(d, f"item{i}.json"), "w") as f:
                json.dump({"type": "Feature", "assets": {
                    "docs": {"href": f"{sf_dir}/documents.parquet",
                             "type": "application/x-parquet"}}}, f)
        tmp = cat + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"type": "Catalog", "links": [
                {"rel": "item", "href": "item1.json"},
                {"rel": "item", "href": "item2.json"}]}, f)
        os.replace(tmp, cat)  # atomic: concurrent callers never see a
        # half-written catalog

    pages = get_source("stac").dataset(cat, include_html=False)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "url": batch["url"],
            "nch": pc.cast(pc.utf8_length(batch["text"]), pa.int64())})
        g = t.group_by("url").aggregate([("nch", "sum"),
                                         ("nch", "count")])
        return pa.table({"url": g["url"], "tc": g["nch_sum"],
                         "n": pc.cast(g["nch_count"], pa.int64())})

    from ray.data.aggregate import Sum

    return pages.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None) \
        .groupby("url").aggregate(Sum("tc", alias_name="total_chars"),
                                  Sum("n", alias_name="n_copies"))


def q_union_counts(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.union_counts(sf_dir)


def q_events_sliding(sf_dir: str):
    from geo_inference_ray import relational as _rel

    return _rel.events_sliding(sf_dir)


def entry() -> Any:
    """Flagship pipeline: pages -> extract_text -> geocode -> cells ->
    broadcast STRtree point-in-polygon inner join, at sf0.001."""
    return q_pip_inner("/root/testdata/sf0.001")


def q_pagerank(sf_dir: str):
    """Fixed-iteration integer PageRank over the part<->supplier
    bipartite graph (iterative join+aggregate rounds; graph.py)."""
    from geo_inference_ray import graph as _graph

    return _graph.pagerank(sf_dir)


def q_hits(sf_dir: str):
    """Fixed-iteration integer HITS hubs/authorities over the directed
    part -> supplier graph (max-normalized int64 sweeps; graph.py)."""
    from geo_inference_ray import graph as _graph

    return _graph.hits(sf_dir)


def q_kcore(sf_dir: str):
    """Median-k core of the part<->supplier graph via bounded parallel
    peeling (graph.py; adaptive k from the degree histogram)."""
    from geo_inference_ray import graph as _graph

    return _graph.kcore(sf_dir)


def q_retention(sf_dir: str):
    """Cohort retention triangle over the events stream."""
    from geo_inference_ray import relational as _rel

    return _rel.retention(sf_dir)


def q_props_extract(sf_dir: str):
    """Vectorized RE2 extraction of the JSON props.k field +
    per-type aggregate (semi-structured metadata extraction)."""
    from geo_inference_ray import relational as _rel

    return _rel.props_extract(sf_dir)


def q_hll_by_source(sf_dir: str):
    """Per-source HyperLogLog register tables (grouped sketch merge)."""
    import ray.data as rd

    from geo_inference_ray import dedup as _d

    return _d.hll_by_source(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


def q_quantiles_by_lang(sf_dir: str):
    """Per-language exact discrete length quantiles via the keyed
    integer-histogram sketch."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.quantiles_by_lang(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]))


def q_corr_stats(sf_dir: str):
    """Per-returnflag Pearson correlation via mergeable integer
    sufficient statistics (second-moment aggregate family)."""
    from geo_inference_ray import relational as _rel

    return _rel.corr_stats(sf_dir)


def q_except_days(sf_dir: str):
    """Distributed keyed set EXCEPT: (user, day) pairs with a purchase
    but no signup — both sides corpus-scale, one flag-merge shuffle."""
    from geo_inference_ray import relational as _rel

    return _rel.except_days(sf_dir)


def q_running_total(sf_dir: str):
    """Per-user running milli-value sum/count in event-time order
    (window SUM OVER ... ROWS UNBOUNDED PRECEDING), sampled output."""
    from geo_inference_ray import relational as _rel

    return _rel.running_total(sf_dir)


def q_pivot_counts(sf_dir: str):
    """Wide lang-by-source cross-tab via map-side conditional
    aggregation (pivot pattern)."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.pivot_counts(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]))


def q_argmax_doc(sf_dir: str):
    """Per-(lang, source) arg-max row retrieval through an
    order-preserving packed-int64 mergeable aggregate."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.argmax_doc(rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["lang", "source", "doc_id", "n_chars"]))


def q_mode_word(sf_dir: str):
    """Per-language token MODE (most frequent, ties -> smallest token):
    grouped argmax with a string payload in three key-bounded rounds."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.mode_word(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]))


def q_moving_window(sf_dir: str):
    """Per-user fixed-width moving-window sum/count (window SUM OVER
    ... ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), sampled output."""
    from geo_inference_ray import relational as _rel

    return _rel.moving_window(sf_dir)


def q_range_join(sf_dir: str):
    """Broadcast range (interval/band) join: orders into irregular
    quadratic price bands via sorted-edge searchsorted, then per-band
    aggregates."""
    from geo_inference_ray import relational as _rel

    return _rel.range_join(sf_dir)


def q_redact_pii(sf_dir: str):
    """PII-style regex redaction + hit counts over the corpus (RE2
    kernels, byte-identical to the oracle's regexp_replace)."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.redact_pii(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]))


def q_rollup_counts(sf_dir: str):
    """GROUP BY ROLLUP(source, lang): three aggregation levels in one
    pass — only the finest grain shuffles."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.rollup_counts(rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["source", "lang", "n_chars"]))


def q_lang_confusion(sf_dir: str):
    """Label-vs-prediction confusion matrix for the marker-word
    language classifier (actor-pool partials, |langs|^2 keys)."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.lang_confusion(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]))


def q_transitions(sf_dir: str):
    """Per-user event-type transition counts (Markov matrix) via one
    user-hash shuffle + vectorized shift kernel."""
    from geo_inference_ray import relational as _rel

    return _rel.transitions(sf_dir)


def q_winsorize_stats(sf_dir: str):
    """Per-language winsorized length stats (p05/p95 clip) from one
    keyed-histogram pass."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.winsorize_stats(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]))


def q_weekly_growth(sf_dir: str):
    """Week-over-week event-volume LAG deltas (calendar-bounded driver
    fold)."""
    from geo_inference_ray import relational as _rel

    return _rel.weekly_growth(sf_dir)


def q_q5_local_supply(sf_dir: str):
    """TPC-H Q5 analog star join: revenue by nation where customer and
    supplier nations match; broadcast-under-cap dimension maps."""
    from geo_inference_ray import relational as _rel

    return _rel.q5_local_supply(sf_dir)


def q_search_topk(sf_dir: str):
    """Multi-term tf-idf retrieval: top-20 documents for the fixed
    demo query, integer milli-nat scoring."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    path = f"{sf_dir}/documents.parquet"
    return _t.search_topk(
        rd.read_parquet(path, columns=["doc_id", "text"]),
        n_docs=_rel_mod._parquet_rows(path))


def q_sliding_distinct(sf_dir: str):
    """Distinct users per sliding 1-hour window (30-min hop): flat
    emit to both owners + one distinct-pair shuffle."""
    from geo_inference_ray import relational as _rel

    return _rel.sliding_distinct(sf_dir)


def q_mad_by_lang(sf_dir: str):
    """Per-language exact median + MAD from ONE keyed-histogram pass
    (the deviation histogram is a driver-side re-key)."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.mad_by_lang(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]))


def q_triangles(sf_dir: str):
    """Per-node triangle counts on the co-supplier graph
    (compact-forward wedges + packed-key closure probe)."""
    from geo_inference_ray import graph as _g

    return _g.triangles(sf_dir)


def q_rfm_scores(sf_dir: str):
    """RFM quartile segmentation (NTILE x3) via range-partitioned
    exact global rank — no global sort."""
    from geo_inference_ray import relational as _rel

    return _rel.rfm_scores(sf_dir)


def q_q3_shipping(sf_dir: str):
    """TPC-H Q3 analog: 3-way join with line-level pre-aggregation
    behind the filters, then a k-bounded exact top-k."""
    from geo_inference_ray import relational as _rel

    return _rel.q3_shipping(sf_dir)


def q_url_dedup(sf_dir: str):
    """URL canonicalization + exact dedup over crawl-variant URLs
    (query strings, fragments, case/slash normalization)."""
    from geo_inference_ray import textops as _t

    return _t.url_dedup(_synth.pages_dataset(sf_dir, include_html=False)
                        .select_columns(["url", "doc_id"]))


def q_order_gap(sf_dir: str):
    """Per-user inter-event gap statistics (the LAG window function,
    distributed as a user-hash shuffle + vectorized diff kernel)."""
    from geo_inference_ray import relational as _rel

    return _rel.order_gap(sf_dir)


def q_cooccur_types(sf_dir: str):
    """Event-type co-occurrence matrix over (user, day) baskets —
    market-basket self-join without the row blowup."""
    from geo_inference_ray import relational as _rel

    return _rel.cooccur_types(sf_dir)


def q_vocab_ids(sf_dir: str):
    """Vocabulary with dense global ids (rank in byte order) via the
    range-key prefix-sum scan — dictionary building without a global
    sort."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.vocab_ids(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]))


def q_source_jaccard(sf_dir: str):
    """Pairwise vocabulary Jaccard between sources (group-similarity
    matrix; per-token bounded pair kernel)."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.source_jaccard(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


def q_user_growth(sf_dir: str):
    """Daily new-vs-active user accounting (first-touch attribution
    rollup; one distinct-pair shuffle, day-bounded driver merge)."""
    from geo_inference_ray import relational as _rel

    return _rel.user_growth(sf_dir)


def q_bloom_join(sf_dir: str):
    """Bloom-prefiltered exact semi-join (128 KB broadcast mask prunes
    the big side batch-locally; survivors verified exactly)."""
    from geo_inference_ray import relational as _rel

    return _rel.bloom_join(sf_dir)


def q_q10_returned(sf_dir: str):
    """TPC-H Q10 analog: returned-item revenue per customer, top-20;
    line revenue pre-aggregated before every join."""
    from geo_inference_ray import relational as _rel

    return _rel.q10_returned(sf_dir)


def q_q14_promo(sf_dir: str):
    """TPC-H Q14 analog: promo revenue share over a shipdate window;
    part dimension reduced to a broadcast (partkey, is_promo) map."""
    from geo_inference_ray import relational as _rel

    return _rel.q14_promo(sf_dir)


def q_q18_big_orders(sf_dir: str):
    """TPC-H Q18 analog: HAVING filter on grouped quantity sums, then
    attribute joins and a deterministic top-100."""
    from geo_inference_ray import relational as _rel

    return _rel.q18_big_orders(sf_dir)


def q_q7_volume(sf_dir: str):
    """TPC-H Q7 analog: cross-nation shipping volume by (supplier
    nation, customer nation, year)."""
    from geo_inference_ray import relational as _rel

    return _rel.q7_volume(sf_dir)


def q_q4_late_orders(sf_dir: str):
    """TPC-H Q4 analog: EXISTS with a cross-table predicate — orders
    with any line shipped > 60 days after the order date, by
    priority."""
    from geo_inference_ray import relational as _rel

    return _rel.q4_late_orders(sf_dir)


def q_llm_prep(sf_dir: str):
    """Composite corpus-prep pipeline: exact dedup -> global quality
    floor (median length) -> context-window chunking."""
    from geo_inference_ray import textops as _t

    return _t.llm_prep(sf_dir)


def q_centroid_by_label(sf_dir: str):
    """Per-label embedding centroid sums (component-wise list-column
    aggregation, milli-quantized for order-independence)."""
    from geo_inference_ray import ann as _a

    return _a.centroid_by_label(sf_dir)


def q_q2_min_cost(sf_dir: str):
    """TPC-H Q2 analog: tie-complete minimum-acctbal supplier per part
    over the distinct lineitem supply relation."""
    from geo_inference_ray import relational as _rel

    return _rel.q2_min_cost_supplier(sf_dir)


def q_user_entropy(sf_dir: str):
    """Per-user event-type Shannon entropy (integer milli-nat
    numerator) — engagement-diversity feature."""
    from geo_inference_ray import relational as _rel

    return _rel.user_entropy(sf_dir)


def q_image_dhash(sf_dir: str):
    """Per-image 64-bit perceptual difference hash (dHash) over the
    real PPM decode path, packed as two int64 halves."""
    from geo_inference_ray import multimodal as _mm

    return _mm.image_dhash(sf_dir)


def q_jsonl_docs(sf_dir: str):
    """documents through the JSONL ingestion path (lossless
    parquet -> JSONL -> Ray native JSON reader round-trip)."""
    from geo_inference_ray import sources as _src

    return _src.jsonl_documents(sf_dir)


def q_kl_by_source(sf_dir: str):
    """Per-source KL divergence vs the corpus token distribution
    (integer milli-nat numerator) — corpus-mix drift detection."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.kl_by_source(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


def q_q19_disjunctive(sf_dir: str):
    """TPC-H Q19 analog: OR-of-ANDs predicate over lineitem x part via
    a broadcast per-partkey arm bitmask."""
    from geo_inference_ray import relational as _rel

    return _rel.q19_disjunctive(sf_dir)


def q_q15_top_supplier(sf_dir: str):
    """TPC-H Q15 analog: supplier(s) whose windowed revenue equals the
    global max (tie-complete; view-vs-max shape)."""
    from geo_inference_ray import relational as _rel

    return _rel.q15_top_supplier(sf_dir)


def q_debounce(sf_dir: str):
    """Per-user event debounce (keep only events > 6h after the last
    KEPT event) — sequential stateful streaming; recursive-CTE
    oracle."""
    from geo_inference_ray import relational as _rel

    return _rel.debounce(sf_dir)


def q_q13_count_dist(sf_dir: str):
    """TPC-H Q13 analog: order-count histogram including zero-order
    customers (left-outer join + map-side-partial histogram)."""
    from geo_inference_ray import relational as _rel

    return _rel.q13_count_dist(sf_dir)


def q_q17_small_qty(sf_dir: str):
    """TPC-H Q17 analog: revenue from below-1/5-of-part-average
    quantity lines of one brand (integer-exact threshold compare)."""
    from geo_inference_ray import relational as _rel

    return _rel.q17_small_qty(sf_dir)


def q_q22_idle_rich(sf_dir: str):
    """TPC-H Q22 analog: above-average positive-balance customers with
    no urgent orders, per nation (broadcast/left_anti exclusion)."""
    from geo_inference_ray import relational as _rel

    return _rel.q22_idle_rich(sf_dir)


def q_q6_forecast(sf_dir: str):
    """TPC-H Q6 analog: single-row revenue forecast — selective scan,
    map-side partial sum, no join."""
    from geo_inference_ray import relational as _rel

    return _rel.q6_forecast(sf_dir)


def q_q12_late_priority(sf_dir: str):
    """TPC-H Q12 analog: high/low priority counts per line status for
    late 1997 shipments (conditional-aggregate join)."""
    from geo_inference_ray import relational as _rel

    return _rel.q12_late_priority(sf_dir)


def q_q8_share(sf_dir: str):
    """TPC-H Q8 analog: one nation's market share of a part type's
    revenue into a region's customers, per order year."""
    from geo_inference_ray import relational as _rel

    return _rel.q8_share(sf_dir)


def q_q9_profit(sf_dir: str):
    """TPC-H Q9 analog: integer-exact fifth-cent profit by supplier
    nation and ship year for name-matched parts."""
    from geo_inference_ray import relational as _rel

    return _rel.q9_profit(sf_dir)


def q_q21_waiting(sf_dir: str):
    """TPC-H Q21 analog: sole late supplier on finished multi-supplier
    orders (EXISTS + NOT-EXISTS via key-local aggregation)."""
    from geo_inference_ray import relational as _rel

    return _rel.q21_waiting(sf_dir)


def q_q16_supplier_cnt(sf_dir: str):
    """TPC-H Q16 analog: distinct suppliers per part
    (brand, type, size) with brand and supplier exclusions."""
    from geo_inference_ray import relational as _rel

    return _rel.q16_supplier_cnt(sf_dir)


def q_ttr_stats(sf_dir: str):
    """Per-document lexical diversity: token count, distinct-token
    count, integer-permille type-token ratio (zero-shuffle)."""
    from geo_inference_ray import textops as _t

    return _t.ttr_stats(sf_dir)


def q_gopher_rules(sf_dir: str):
    """Composite Gopher-style quality screen: per-document 5-bit rule
    mask + keep verdict (integer-exact predicates, zero shuffle)."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _t.gopher_rules(ds)


def q_rendezvous(sf_dir: str):
    """Rendezvous/HRW consistent shard assignment: per-shard doc
    counts + id checksum (minimal-disruption sharding)."""
    return _rel_mod.rendezvous_shards(sf_dir)


def q_winnow(sf_dir: str):
    """Winnowing fingerprints (SIGMOD '03 local selection): per-doc
    selected-set stats over k-byte-gram rolling hashes."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    return _t.winnow_fingerprints(
        rd.read_parquet(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"]))


def q_bm25_topk(sf_dir: str):
    """Okapi BM25 retrieval: top-20 documents for the fixed demo
    query, plus-half idf, per-term floor-quantized contributions."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    path = f"{sf_dir}/documents.parquet"
    return _t.bm25_topk(
        rd.read_parquet(path, columns=["doc_id", "text"]),
        n_docs=_rel_mod._parquet_rows(path))


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights: add-1-smoothed unigram log-likelihood
    ratio (target lang='en' vs raw corpus), integer milli-nat sums."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    return _t.dsir_weights(ds)


def q_graph_components(sf_dir: str):
    """Connected components of the sparsified part<->supplier graph
    (star contraction; node labeled with its component's min id)."""
    from geo_inference_ray import graph as _g

    return _g.graph_components(sf_dir)


def q_semdedup_keep(sf_dir: str):
    """SemDeDup cluster-scoped semantic prune: k-means clusters (the
    kmeans assignment), then drop vectors whose quantized cosine to a
    lower-id cluster member reaches SEM_T_MILLI/1000 (0.38 — sited
    where both outcomes occur on the near-orthogonal synthetic
    embeddings; real corpora run ~0.95) — ann.semdedup_keep."""
    from geo_inference_ray import ann as _ann

    return _ann.semdedup_keep(sf_dir)


def q_ngram_repetition(sf_dir: str):
    """Gopher repetition signals: per-doc permille of characters in
    the top word 2-gram and in duplicated word 3-grams (integer floor
    arithmetic, zero shuffle — textops.ngram_repetition)."""
    import ray.data as rd

    from geo_inference_ray import textops as _t

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return _t.ngram_repetition(ds)


def q_q11_important_parts(sf_dir: str):
    """TPC-H Q11 analog: parts above a fixed permille share of one
    nation's supply revenue (HAVING vs global scalar)."""
    from geo_inference_ray import relational as _rel

    return _rel.q11_important_parts(sf_dir)


def q_q20_excess_share(sf_dir: str):
    """TPC-H Q20 analog: suppliers shipping >1/5 of a name-matched
    part's windowed quantity (semi-join vs per-group threshold)."""
    from geo_inference_ray import relational as _rel

    return _rel.q20_excess_share(sf_dir)


def q_interval_union(sf_dir: str):
    """Per-user union length of 30-min activity intervals (merged
    islands): n_sessions + covered_us, one user-hash exchange."""
    from geo_inference_ray import analytics as _an

    return _an.interval_union(sf_dir)


def q_trigram_paths(sf_dir: str):
    """Consecutive event-type triple counts per user order — the
    3-gram sequence-mining operator (partials per user partition)."""
    from geo_inference_ray import analytics as _an

    return _an.trigram_paths(sf_dir)


def q_ntile_buckets(sf_dir: str):
    """Per-language NTILE(4) over (n_chars, doc_id): per-tile count,
    min and max — exact ranked bucketing."""
    from geo_inference_ray import analytics as _an

    return _an.ntile_buckets(sf_dir)


def q_cube_counts(sf_dir: str):
    """GROUP BY CUBE(lang, source): all four grouping sets with NULL
    roll-up markers, re-aggregated from the one-pass base."""
    from geo_inference_ray import analytics as _an

    return _an.cube_counts(sf_dir)


def q_dim_variance(sf_dir: str):
    """Per-dimension embedding moments (n, sum, sum-of-squares in
    fixed-point millis) — the list-explode aggregate."""
    from geo_inference_ray import analytics as _an

    return _an.dim_variance(sf_dir)


def q_skyline_docs(sf_dir: str):
    """Distributed Pareto skyline on (n_words max, n_chars min) —
    local vectorized frontier per block, one final merge pass."""
    from geo_inference_ray import analytics as _an

    return _an.skyline_docs(sf_dir)


def q_ewma_daily(sf_dir: str):
    """Integer-exact EWMA (alpha=1/2 fixed-point) over per-type daily
    event counts — sequential fold, recursive-CTE oracle."""
    from geo_inference_ray import analytics as _an

    return _an.ewma_daily(sf_dir)


def q_bfs_hops(sf_dir: str):
    """Multi-source BFS hop counts (4 rounds) over the part<->supplier
    graph — frontier expansion with a recursive-CTE oracle."""
    from geo_inference_ray import analytics as _an

    return _an.bfs_hops(sf_dir)


def q_typo_pairs(sf_dir: str):
    """Vocabulary pairs within Levenshtein distance 2 via the SymSpell
    deletion-neighborhood join + exact vectorized DP verify."""
    from geo_inference_ray import analytics as _an

    return _an.typo_pairs(sf_dir)


def q_lang_concat(sf_dir: str):
    """Per-source distinct-language roster: count + sorted
    comma-joined list (the ordered string_agg shape)."""
    from geo_inference_ray import analytics as _an

    return _an.lang_concat(sf_dir)


def q_hierarchy_rollup(sf_dir: str):
    """Subtree revenue totals over the decimal prefix trie of part
    keys — hierarchical rollup via constant-factor ancestor explode."""
    from geo_inference_ray import analytics as _an

    return _an.hierarchy_rollup(sf_dir)


def q_covisit_pairs(sf_dir: str):
    """User pairs sharing >= 3 active days — co-visitation similarity
    join with per-day bucket kernel + deterministic cap."""
    from geo_inference_ray import analytics as _an

    return _an.covisit_pairs(sf_dir)


def q_cell_smooth(sf_dir: str):
    """Ring-1 hex-neighborhood density smoothing (H3 grid_disk
    aggregate): two cell-bounded shuffles, pages never re-shuffled."""
    from geo_inference_ray import geoext as _gx

    return _gx.cell_smooth(_stages.geo_pipeline(sf_dir))


def q_track_legs(sf_dir: str):
    """Per-cluster great-circle track legs (chord metric, bit-exact
    trig) over doc_id-ordered pages."""
    from geo_inference_ray import geoext as _gx

    return _gx.track_legs(sf_dir)


def q_bbox_join(sf_dir: str):
    """Envelope-overlap spatial-join filter phase: per-polygon
    candidate counts from broadcast bbox layer."""
    from geo_inference_ray import geoext as _gx

    return _gx.bbox_overlap_counts(sf_dir)


def q_nearest_poly(sf_dir: str):
    """Nearest-centroid polygon assignment per page (broadcast argmin,
    zero shuffle)."""
    from geo_inference_ray import geoext as _gx

    return _gx.nearest_poly(sf_dir)


def q_zorder(sf_dir: str):
    """Morton/Z-order spatial key histogram: 16-bit quantized lat/lon
    interleave, counts per 12-bit Z prefix (the range-partitioner's
    split-point input)."""
    from geo_inference_ray import geoext as _gx

    return _gx.zorder_counts(sf_dir)


def q_dist_join(sf_dir: str):
    """Great-circle distance-band join: per-POI count of pages within
    500 chord-km of the broadcast centroid layer."""
    from geo_inference_ray import geoext as _gx

    return _gx.dist_join(sf_dir)


def q_hotspots(sf_dir: str):
    """Integer-exact ring-1 hot-cell detection: populated hex7 cells
    whose disk count exceeds 2x the uniform expectation
    (cross-multiplied integer inequality, no float z-score)."""
    from geo_inference_ray import geoext as _gx
    from geo_inference_ray import stages as _stages

    return _gx.hotspots(_stages.geo_pipeline(sf_dir))


def q_hex_clusters(sf_dir: str):
    """Hex-grid DBSCAN region growing: 6-neighbor connected components
    of dense cells (>= 3 pages), per-component cell and page counts."""
    from geo_inference_ray import geoext as _gx
    from geo_inference_ray import stages as _stages

    return _gx.hex_clusters(_stages.geo_pipeline(sf_dir))


def q_pip_anti(sf_dir: str):
    """Anti spatial join: pages inside NO polygon (complement of
    pip_semi; completes the inner/semi/left/anti mode family)."""
    ds = _stages.geo_pipeline(sf_dir, mode="anti")
    return ds.select_columns(["doc_id", "lat", "lon"])


def q_cluster_centroid(sf_dir: str):
    """Exact per-cluster mean position via integer half-microdegree
    sums (order-independent; single final division)."""
    from geo_inference_ray import geoext as _gx

    return _gx.cluster_centroid(sf_dir)


def q_cell_langmix(sf_dir: str):
    """Per-hex7-cell language diversity: distinct langs + majority
    share in integer permille."""
    from geo_inference_ray import geoext as _gx

    return _gx.cell_langmix(_stages.geo_pipeline(sf_dir),
                            rows_hint=_gx._docs_rows(sf_dir))


def q_od_flows(sf_dir: str):
    """Origin-destination flow matrix: (first-cell, last-cell) track
    counts per cluster — the mobility OD primitive."""
    from geo_inference_ray import geoext as _gx

    return _gx.od_flows(sf_dir)


def q_radius_gyration(sf_dir: str):
    """Per-cluster radius of gyration (integer-quantized variance
    sums; single final sqrt) — the mobility dispersion measure."""
    from geo_inference_ray import geoext as _gx

    return _gx.radius_gyration(sf_dir)


def q_geohash(sf_dir: str):
    """Per-geohash5 page counts — the fourth cell-index scheme
    (base-32 Morton readout, lon-first interleave)."""
    from geo_inference_ray import geoext as _gx

    return _gx.geohash_counts(sf_dir)


def q_cell_markov(sf_dir: str):
    """First-order hex7 transition counts over per-cluster tracks —
    the Markov mobility-model estimator."""
    from geo_inference_ray import geoext as _gx

    return _gx.cell_markov(sf_dir)


def q_emb_quantize(sf_dir: str):
    """Int8 scalar quantization codes for the embedding column
    (per-dim global min/max; exact integer floor arithmetic)."""
    from geo_inference_ray import ann as _ann

    return _ann.emb_quantize(sf_dir)


def q_mobility_entropy(sf_dir: str):
    """Per-cluster Shannon entropy of the hex7 visit distribution
    (integer milli-nat numerator) — the predictability feature."""
    from geo_inference_ray import geoext as _gx

    return _gx.mobility_entropy(sf_dir)


def q_traj_jaccard(sf_dir: str):
    """Co-travel pairs: exact integer-permille Jaccard of the visited
    hex7 cell sets for every cluster pair sharing >= 1 cell."""
    from geo_inference_ray import geoext as _gx

    return _gx.traj_jaccard(sf_dir)


def q_peak_hour(sf_dir: str):
    """Per-hex7-cell peak crawl hour (ties -> lowest hour) + count —
    the space-time rhythm screen."""
    from geo_inference_ray import geoext as _gx

    return _gx.peak_hour(sf_dir)


def q_hilbert(sf_dir: str):
    """Per-Hilbert-prefix page histogram — the lower-adjacency
    range-partitioner key next to zorder."""
    from geo_inference_ray import geoext as _gx

    return _gx.hilbert_counts(sf_dir)


def q_cell_sample(sf_dir: str):
    """Deterministic per-hex7-cell k-sample (smallest multiplicative
    hash, ties by doc_id) — the geo-stratified corpus sampler."""
    from geo_inference_ray import geoext as _gx

    return _gx.cell_sample(sf_dir)


def q_z_splits(sf_dir: str):
    """Exact N-way range-partition split points over the Morton key
    space (domain-bounded histogram, integer ceil targets)."""
    from geo_inference_ray import geoext as _gx

    return _gx.z_splits(sf_dir)


def q_cluster_bbox(sf_dir: str):
    """Per-cluster track bounding box + exact integer box area
    (half-microdegree grid)."""
    from geo_inference_ray import geoext as _gx

    return _gx.cluster_bbox(sf_dir)


def q_s2_compact(sf_dir: str):
    """Mixed-granularity S2 cell cover (H3 compact() analog): complete
    4-sibling level-12 sets collapse to their level-11 parent."""
    from geo_inference_ray import geoext as _gx

    return _gx.s2_compact(sf_dir)


def q_stops(sf_dir: str):
    """Trajectory stop detection: per-cluster count of maximal dwell
    runs (>= 2 consecutive legs under 60 chord-km) + longest run."""
    from geo_inference_ray import geoext as _gx

    return _gx.stops(sf_dir)


def q_bearings(sf_dir: str):
    """Per-(cluster, octant) leg direction histogram — octants from
    exact sign/magnitude comparisons, no atan2."""
    from geo_inference_ray import geoext as _gx

    return _gx.bearings(sf_dir)


def q_zonal_mode(sf_dir: str):
    """Zonal majority class: per-polygon modal page language
    (tie -> smallest lang) over the exact PIP join."""
    from geo_inference_ray import geoext as _gx

    return _gx.zonal_mode(sf_dir)


def q_z_range(sf_dir: str):
    """Morton-key range-query counts over 8 fixed quadtree-cell
    ranges (the bbox-query-over-Z-sorted-table primitive)."""
    from geo_inference_ray import geoext as _gx

    return _gx.z_range(sf_dir)


def q_weighted_median(sf_dir: str):
    """Quantity-weighted lower-median price per return flag, exact
    integer cents (price-domain-bounded shuffle)."""
    from geo_inference_ray import analytics as _an

    return _an.weighted_median(sf_dir)


def q_streaks(sf_dir: str):
    """Longest consecutive-active-day run per user
    (gaps-and-islands, integer epoch-days)."""
    from geo_inference_ray import analytics as _an

    return _an.streaks(sf_dir)


def q_pmi_topk(sf_dir: str):
    """Top-100 bigram collocations by integer-milli-nat PMI (support
    floor 5) — collocation mining over the document corpus; the sort
    input is candidate-bounded, never corpus-bounded."""
    return _textops.pmi_topk(_docs_text(sf_dir))


def q_cusum_shift(sf_dir: str):
    """Per-event-type integer CUSUM change-point over daily counts:
    max_k |n*S_k - k*S_n| with the earliest argmax day."""
    from geo_inference_ray import analytics as _an

    return _an.cusum_shift(sf_dir)


def q_keyness_topk(sf_dir: str):
    """Per-source Dunning-G2 keyness keywords (top 20, milli-nat
    floor, support floor 5): corpus-linguistics 'what characterizes
    this source vs the rest'."""
    import ray.data as rd

    return _textops.keyness_topk(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]))


def q_theilsen_slope(sf_dir: str):
    """Per-event-type Theil-Sen daily-count trend: lower median of
    integer milli-slopes over all day pairs."""
    from geo_inference_ray import analytics as _an

    return _an.theilsen_slope(sf_dir)


def q_gini_by_source(sf_dir: str):
    """Per-source exact integer Gini coefficient of document lengths
    (micro units) from the length histogram."""
    from geo_inference_ray import analytics as _an

    return _an.gini_by_source(sf_dir)


def q_moran_i(sf_dir: str):
    """Global Moran's I over hex7 page counts (ring-1 weights):
    exact integer components (n_cells, w_pairs, num, den)."""
    from geo_inference_ray import geoext as _gx

    return _gx.moran_i(_stages.geo_pipeline(sf_dir))


def q_lexical_entropy(sf_dir: str):
    """Per-doc lexical diversity: token total, distinct count, and the
    order-free integer entropy term sum(tf * floor(1000*ln(tf)))."""
    return _textops.lexical_entropy(_docs_text(sf_dir))


def q_fano_factor(sf_dir: str):
    """Per-event-type burstiness of daily counts: exact integer
    variance-to-mean in micro units."""
    from geo_inference_ray import analytics as _an

    return _an.fano_factor(sf_dir)


def q_lisa_cells(sf_dir: str):
    """Local Moran (LISA) HH/LL/HL/LH cluster labels per populated
    hex7 cell — the per-cell decomposition of moran_i."""
    from geo_inference_ray import geoext as _gx

    return _gx.lisa_cells(_stages.geo_pipeline(sf_dir))


def q_zipf_fit(sf_dir: str):
    """Zipf rank-frequency fit components (integer-quantized log-log
    sums) from the frequency histogram — no vocab-wide rank pass."""
    return _textops.zipf_fit(_docs_text(sf_dir))


def q_knox_pairs(sf_dir: str):
    """Knox space-time interaction: same-hex7-cell page pairs within
    a 1 h warc_ts window, exact integer counts per cell."""
    from geo_inference_ray import geoext as _gx

    return _gx.knox_pairs(_stages.geo_pipeline(sf_dir),
                          rows_hint=_gx._docs_rows(sf_dir))


def q_ks_drift(sf_dir: str):
    """Per-source KS drift of the length distribution vs the rest,
    division-free: max |nb*A(v) - na*B(v)| over the value grid."""
    import ray.data as rd

    return _textops.ks_drift(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]))


def q_pq_codes(sf_dir: str):
    """Product-quantization codebook assignment: integer-exact Lloyd
    per dim subspace, one (vec_id, sub, code, dist) row each."""
    return _ann.pq_codes(sf_dir)


def q_acf_lag1(sf_dir: str):
    """Per-event-type lag-1 autocorrelation integer components of the
    daily count series (consecutive observed days only)."""
    from geo_inference_ray import analytics as _an

    return _an.acf_lag1(sf_dir)


def q_peak_concurrency(sf_dir: str):
    """Per-event-type peak concurrent 30-min sessions with the
    earliest attaining timestamp (bucket-scatter ghost-row kernel)."""
    from geo_inference_ray import analytics as _an

    return _an.peak_concurrency(sf_dir)


def q_mannwhitney_u(sf_dir: str):
    """Per-source Mann-Whitney 2U rank-sum of the length distribution
    vs the rest — division-free integer (ties count 1 in 2U)."""
    import ray.data as rd

    return _textops.mannwhitney_u(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]))


def q_benford(sf_dir: str):
    """Benford first-digit profile of n_chars per source with the
    integer-quantized log10 expectation."""
    import ray.data as rd

    return _textops.benford(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]))


def q_chi2_contingency(sf_dir: str):
    """lang × source contingency cells with exact arbitrary-precision
    chi-square components (micro-units)."""
    import ray.data as rd

    return _textops.chi2_contingency(rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]))


def q_heaps_law(sf_dir: str):
    """Heaps'-law vocabulary-growth curve on the power-of-two doc
    grid."""
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    from geo_inference_ray.relational import _parquet_rows

    return _textops.heaps_law(
        rd.read_parquet(path, columns=["doc_id", "text"]),
        n_docs=_parquet_rows(path))


def q_attribution(sf_dir: str):
    """Last-touch purchase attribution within a 30-min lookback,
    rolled up per credited event type."""
    from geo_inference_ray import relational as _rel

    return _rel.attribution(sf_dir)


def q_grid_idw(sf_dir: str):
    """IDW interpolation of page density onto empty hex7 cells within
    hex distance 2 (1/d² integer weights, join-free anti-semijoin)."""
    from geo_inference_ray import geoext as _gx

    return _gx.grid_idw(_stages.geo_pipeline(sf_dir))


def q_rolling_median(sf_dir: str):
    """Exact trailing-7-day rolling median (doubled-integer) of daily
    event counts per type."""
    from geo_inference_ray import relational as _rel

    return _rel.rolling_median(sf_dir)


def q_session_path_topk(sf_dir: str):
    """Top-20 session event-type paths (30-min sessions, first 8
    types, '>'-joined) by count."""
    from geo_inference_ray import analytics as _an

    return _an.session_path_topk(sf_dir)


def q_out_of_order(sf_dir: str):
    """Watermark audit per event type: late-arrival counts and
    lateness vs the running max event time in arrival order
    (distributed exclusive prefix max)."""
    from geo_inference_ray import analytics as _an

    return _an.out_of_order(sf_dir)


def q_silhouette(sf_dir: str):
    """Per-cluster integer simplified silhouette of the kmeans
    clustering (second-nearest-centroid ratio, milli-units)."""
    return _ann.silhouette(sf_dir)


def q_hybrid_rrf(sf_dir: str):
    """Reciprocal-rank fusion of the lexical tf-idf top-20 and the
    semantic cosine top-10 (query 0) — hybrid search."""
    return _ann.hybrid_rrf(sf_dir)


def q_emerging_hotspots(sf_dir: str):
    """Mann-Kendall daily-count trend per hex7 cell (space-time-cube
    emerging-hot-spot screen, integer S)."""
    from geo_inference_ray import geoext as _gx

    return _gx.emerging_hotspots(_stages.geo_pipeline(sf_dir))


def q_extract_title(sf_dir: str):
    """<title> field extraction from the raw html bytes with the
    page-integrity probe (title == 'doc <id>')."""
    ds = _synth.pages_dataset(sf_dir)
    return ds.map_batches(_stages.ExtractTitle, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=_pool_caps(None))


# ROUND-5 DRIVER WINDOW (see README "Driver correctness window" and
# scripts/window_r05.json): the driver writes CORRECTNESS rows for
# exactly the FIRST 50 entries of queries(), so the registry is
# reordered each round to front-load never-driver-checked queries.
# Cumulative r1-r4 distinct checked = 116; this window holds 50 of the
# 114 never-checked (plus asof_prior_anchor, re-queued after its r4
# nullable-representation fix — see relational.py asof_part).  The
# window covers the families VERDICT r4 named: the 12 explicitly
# requested queries, the graph flagships (pagerank/triangles/bfs_hops
# — the r4 verdict table listed pagerank/triangles as driver-green but
# no CORRECTNESS file contains them), 15 geoext kernels, 8 analytics
# kernels, and dedup/ann/multimodal/source singletons.  Queries left
# out are each kin to a driver-green family and carry local evidence
# (scripts/compare.py exact rows at sf0.001/sf0.01 + pytest pins).
_R5_WINDOW = [
    "asof_prior_anchor",
    # VERDICT r4 "next round" item 2 explicit list
    "pip_anti", "gopher_rules", "hits_scores", "kcore_nodes",
    "ppjoin_pairs", "cdc_chunks", "span_dedup", "containment_pairs",
    "kmv_distinct", "boiler_score", "mutual_knn", "zonemap_range",
    # graph flagships (no prior driver row despite verdict table)
    "pagerank", "triangles", "bfs_hops",
    # dedup / ann never-checked
    "dedup_best", "minhash_est", "novelty_docs", "pq_codes",
    "silhouette",
    # relational analogs
    "rfm_scores", "retention",
    # multimodal / sources / text contracts
    "image_dhash", "jsonl_docs", "extract_title", "llm_prep",
    "ttr_stats",
    # geoext kernels (one per distinct kernel family; bearings /
    # radius_gyration / nearest_poly / zonal_mode ceded their slots
    # to the round-5 flagship LLM ops below — each stays covered by
    # a same-family window member or a prior driver row: track_legs/
    # stops/traj_jaccard for the trajectory kernels, dist_join/
    # bbox_join for the proximity joins, driver-green zonal_stats
    # for the zonal family)
    "cell_smooth", "track_legs", "bbox_join",
    "dist_join", "hotspots", "hex_clusters", "stops",
    "od_flows", "cell_markov",
    "traj_jaccard", "hilbert",
    # round-5 flagship training-data ops (new this round)
    "ngram_repetition", "semdedup_keep", "dsir_weights",
    "graph_components",
    # analytics kernels (hierarchy_rollup deferred: kin to the
    # driver-green rollup_counts row from r4)
    "interval_union", "trigram_paths", "ntile_buckets", "cube_counts",
    "skyline_docs", "ewma_daily", "typo_pairs",
]
assert len(_R5_WINDOW) == 50


def queries() -> dict[str, Callable[[str], Any]]:
    all_q = {
        "kmeans": q_kmeans,
        "simhash_pairs": q_simhash_pairs,
        "bloom_probe": q_bloom_probe,
        "hll_registers": q_hll_registers,
        "funnel": q_funnel,
        "events_rollup": q_events_rollup,
        "distinct_users": q_distinct_users,
        "length_rank": q_length_rank,
        "multi_source": q_multi_source,
        "asof_prior_anchor": q_asof_prior_anchor,
        "anchor_window_follow": q_anchor_window_follow,
        "host_stats": q_host_stats,
        "ccnet_buckets": q_ccnet_buckets,
        "stac_union": q_stac_union,
        "sq_topk": q_sq_topk,
        "dup_spans": q_dup_spans,
        "mix_sample": q_mix_sample,
        "corr_stats": q_corr_stats,
        "except_days": q_except_days,
        "running_total": q_running_total,
        "pivot_counts": q_pivot_counts,
        "argmax_doc": q_argmax_doc,
        "mode_word": q_mode_word,
        "moving_window": q_moving_window,
        "range_join": q_range_join,
        "redact_pii": q_redact_pii,
        "rollup_counts": q_rollup_counts,
        "q10_returned": q_q10_returned,
        "q14_promo": q_q14_promo,
        "q18_big_orders": q_q18_big_orders,
        "q7_volume": q_q7_volume,
        "q13_count_dist": q_q13_count_dist,
        "q17_small_qty": q_q17_small_qty,
        "q22_idle_rich": q_q22_idle_rich,
        "debounce": q_debounce,
        "q15_top_supplier": q_q15_top_supplier,
        "q19_disjunctive": q_q19_disjunctive,
        "kl_by_source": q_kl_by_source,
        "user_entropy": q_user_entropy,
        "q2_min_cost": q_q2_min_cost,
        "centroid_by_label": q_centroid_by_label,
        "q4_late_orders": q_q4_late_orders,
        "q6_forecast": q_q6_forecast,
        "q12_late_priority": q_q12_late_priority,
        "q8_share": q_q8_share,
        "q9_profit": q_q9_profit,
        "q21_waiting": q_q21_waiting,
        "q16_supplier_cnt": q_q16_supplier_cnt,
        "q11_important_parts": q_q11_important_parts,
        "q20_excess_share": q_q20_excess_share,
        "ann_topk": q_ann_topk,
        "ivf_topk": q_ivf_topk,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "embedding_near_dup": q_embedding_near_dup,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "bucketed_join": q_bucketed_join,
        "top_orders_per_customer": q_top_orders_per_customer,
        "events_hourly": q_events_hourly,
        "union_counts": q_union_counts,
        "events_sliding": q_events_sliding,
        "sessionize": q_sessionize,
        "native_join": q_native_join,
        "pip_count_by_poly": q_pip_count_by_poly,
        "hash_sample": q_hash_sample,
        "knn_cell": q_knn_cell,
        "mask_tiles": q_mask_tiles,
        "dedup_exact": q_dedup_exact,
        "dedup_clusters": q_dedup_clusters,
        "dedup_apply": q_dedup_apply,
        "minhash_verified": q_minhash_verified,
        "pip_inner": q_pip_inner,
        "chunk_dedup": q_chunk_dedup,
        "length_quantiles": q_length_quantiles,
        "bigram_surprisal": q_bigram_surprisal,
        "quality_filter": q_quality_filter,
        "knn_ring1": q_knn_ring1,
        "rasterize": q_rasterize,
        "tile_pyramid": q_tile_pyramid,
        "zonal_stats": q_zonal_stats,
        "pip_semi": q_pip_semi,
        "pip_left": q_pip_left,
        "s2_cells": q_s2_cells,
        "cell_agg": q_cell_agg,
        "pages": q_pages,
        "extract_text": q_extract_text,
        "geocode": q_geocode,
        "hex_cells": q_hex_cells,
        "polygons": q_polygons,
        "yolo": q_yolo,
        "coco_annotations": q_coco_annotations,
        "polygons_dist": q_polygons_dist,
        "polygon_components": q_polygon_components,
        "polygon_rings": q_polygon_rings,
        "manifest": q_manifest,
        "media_features": q_media_features,
        "media_frames": q_media_frames,
        "image_thumbs": q_image_thumbs,
        "token_count": q_token_count,
        "token_regex": q_token_regex,
        "quality": q_quality,
        "langid": q_langid,
        "word_count": q_word_count,
        "repetition": q_repetition,
        "source_stats": q_source_stats,
        "surprisal": q_surprisal,
        "ngram_topk": q_ngram_topk,
        "tfidf_topk": q_tfidf_topk,
        "chunk_docs": q_chunk_docs,
        "pack_sequences": q_pack_sequences,
        "decontaminate": q_decontaminate,
        "inverted_index": q_inverted_index,
        "train_shuffle": q_train_shuffle,
        "stratified_sample": q_stratified_sample,
        "fingerprint": q_fingerprint,
        "cms_heavy": q_cms_heavy,
        "weighted_sample": q_weighted_sample,
        "pagerank": q_pagerank,
        "retention": q_retention,
        "props_extract": q_props_extract,
        "hll_by_source": q_hll_by_source,
        "quantiles_by_lang": q_quantiles_by_lang,
        "order_gap": q_order_gap,
        "cooccur_types": q_cooccur_types,
        "vocab_ids": q_vocab_ids,
        "source_jaccard": q_source_jaccard,
        "user_growth": q_user_growth,
        "bloom_join": q_bloom_join,
        "url_dedup": q_url_dedup,
        "q3_shipping": q_q3_shipping,
        "rfm_scores": q_rfm_scores,
        "triangles": q_triangles,
        "sliding_distinct": q_sliding_distinct,
        "mad_by_lang": q_mad_by_lang,
        "search_topk": q_search_topk,
        "q5_local_supply": q_q5_local_supply,
        "winsorize_stats": q_winsorize_stats,
        "weekly_growth": q_weekly_growth,
        "lang_confusion": q_lang_confusion,
        "transitions": q_transitions,
        "jsonl_docs": q_jsonl_docs,
        "image_dhash": q_image_dhash,
        "llm_prep": q_llm_prep,
        "ttr_stats": q_ttr_stats,
        # --- added late round 4 (session 2): never driver-checked;
        # r5 window candidates alongside the four deferred entries ---
        "interval_union": q_interval_union,
        "trigram_paths": q_trigram_paths,
        "ntile_buckets": q_ntile_buckets,
        "cube_counts": q_cube_counts,
        "dim_variance": q_dim_variance,
        "skyline_docs": q_skyline_docs,
        "ewma_daily": q_ewma_daily,
        "bfs_hops": q_bfs_hops,
        "typo_pairs": q_typo_pairs,
        "lang_concat": q_lang_concat,
        "hierarchy_rollup": q_hierarchy_rollup,
        "covisit_pairs": q_covisit_pairs,
        "cell_smooth": q_cell_smooth,
        "track_legs": q_track_legs,
        "bbox_join": q_bbox_join,
        "nearest_poly": q_nearest_poly,
        "weighted_median": q_weighted_median,
        "streaks": q_streaks,
        "zorder": q_zorder,
        "dist_join": q_dist_join,
        "hotspots": q_hotspots,
        "hex_clusters": q_hex_clusters,
        "stops": q_stops,
        "bearings": q_bearings,
        "zonal_mode": q_zonal_mode,
        "z_range": q_z_range,
        "pip_anti": q_pip_anti,
        "cluster_centroid": q_cluster_centroid,
        "cell_langmix": q_cell_langmix,
        "od_flows": q_od_flows,
        "radius_gyration": q_radius_gyration,
        "gopher_rules": q_gopher_rules,
        "ngram_repetition": q_ngram_repetition,
        "semdedup_keep": q_semdedup_keep,
        "graph_components": q_graph_components,
        "dsir_weights": q_dsir_weights,
        "bm25_topk": q_bm25_topk,
        "winnow_fp": q_winnow,
        "rendezvous_shards": q_rendezvous,
        "geohash": q_geohash,
        "cell_markov": q_cell_markov,
        "emb_quantize": q_emb_quantize,
        "mobility_entropy": q_mobility_entropy,
        "traj_jaccard": q_traj_jaccard,
        "peak_hour": q_peak_hour,
        "hilbert": q_hilbert,
        "cell_sample": q_cell_sample,
        "z_splits": q_z_splits,
        "cluster_bbox": q_cluster_bbox,
        "s2_compact": q_s2_compact,
        "pmi_topk": q_pmi_topk,
        "cusum_shift": q_cusum_shift,
        "keyness_topk": q_keyness_topk,
        "theilsen_slope": q_theilsen_slope,
        "gini_by_source": q_gini_by_source,
        "moran_i": q_moran_i,
        "lexical_entropy": q_lexical_entropy,
        "fano_factor": q_fano_factor,
        "lisa_cells": q_lisa_cells,
        "zipf_fit": q_zipf_fit,
        "knox_pairs": q_knox_pairs,
        "ks_drift": q_ks_drift,
        "pq_codes": q_pq_codes,
        "acf_lag1": q_acf_lag1,
        "mannwhitney_u": q_mannwhitney_u,
        "peak_concurrency": q_peak_concurrency,
        "benford": q_benford,
        "chi2_contingency": q_chi2_contingency,
        "heaps_law": q_heaps_law,
        "attribution": q_attribution,
        "grid_idw": q_grid_idw,
        "rolling_median": q_rolling_median,
        "session_path_topk": q_session_path_topk,
        "out_of_order": q_out_of_order,
        "silhouette": q_silhouette,
        "hybrid_rrf": q_hybrid_rrf,
        "emerging_hotspots": q_emerging_hotspots,
        "extract_title": q_extract_title,
        "ppjoin_pairs": q_ppjoin_pairs,
        "poly_geom": q_poly_geom,
        "dedup_best": q_dedup_best,
        "cdc_chunks": q_cdc_chunks,
        "minhash_est": q_minhash_est,
        "novelty_docs": q_novelty_docs,
        "mutual_knn": q_mutual_knn,
        "zonemap_range": q_zonemap_range,
        "span_dedup": q_span_dedup,
        "containment_pairs": q_containment_pairs,
        "kmv_distinct": q_kmv_distinct,
        "boiler_score": q_boiler_score,
        "hits_scores": q_hits,
        "kcore_nodes": q_kcore,
    }
    assert set(_R5_WINDOW) <= set(all_q), \
        sorted(set(_R5_WINDOW) - set(all_q))
    tail = {k: v for k, v in all_q.items() if k not in set(_R5_WINDOW)}
    return {**{k: all_q[k] for k in _R5_WINDOW}, **tail}


def _kmeans_d2_cte() -> str:
    """Shared 2-iteration integer-exact Lloyd CTE chain ending at
    ``d2(vec_id, cid, dist)`` — the single source of truth for the
    kmeans / silhouette / semdedup_keep mirror prefixes (a desynced
    copy would silently fork an oracle)."""
    from geo_inference_ray import ann as _ann

    return f"""
WITH elems AS (
  SELECT vec_id, g.i AS dim,
         CAST(floor(CAST(embedding[g.i] AS DOUBLE) * {_ann.KMEANS_SCALE}.0)
              AS BIGINT) AS qx
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
seeds AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
          FROM (SELECT vec_id FROM embeddings
                ORDER BY vec_id LIMIT {_ann.KMEANS_K})),
c0 AS (SELECT s.cid, e.dim, e.qx AS qc
       FROM seeds s JOIN elems e USING (vec_id)),
d1 AS (SELECT e.vec_id, c.cid,
              SUM((e.qx - c.qc) * (e.qx - c.qc)) AS dist
       FROM elems e JOIN c0 c ON c.dim = e.dim
       GROUP BY e.vec_id, c.cid),
a1 AS (SELECT vec_id, cid FROM (
         SELECT vec_id, cid,
                ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cid) AS rn
         FROM d1) WHERE rn = 1),
m1 AS (SELECT a.cid, e.dim,
              CAST(floor(CAST(SUM(e.qx) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS qc
       FROM a1 a JOIN elems e USING (vec_id) GROUP BY a.cid, e.dim),
c1 AS (SELECT c0.cid, c0.dim, COALESCE(m1.qc, c0.qc) AS qc
       FROM c0 LEFT JOIN m1 ON m1.cid = c0.cid AND m1.dim = c0.dim),
d2 AS (SELECT e.vec_id, c.cid,
              SUM((e.qx - c.qc) * (e.qx - c.qc)) AS dist
       FROM elems e JOIN c1 c ON c.dim = e.dim
       GROUP BY e.vec_id, c.cid)"""


def _hilbert_sql_steps() -> str:
    """Generated CTE chain mirroring geoext.hilbert_d bit-for-bit: one
    CTE per bit level s = 128..1, each computing the classic xy2d step
    (d += s*s*((3*rx)^ry); conditional flip + swap).  All-integer, so
    the mirror is exact by construction; the (3*rx)^ry term is a CASE
    over rx*2+ry (values 0,1,3,2)."""
    steps = []
    prev = "hq"
    for i, s in enumerate(1 << b for b in
                          range(_gx_mod.HILBERT_BITS - 1, -1, -1)):
        steps.append(f"""
hs{i} AS (SELECT
  d + {s * s} * (CASE ((CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END) * 2
                 + (CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END))
                 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3
                 ELSE 2 END) AS d,
  CASE WHEN (y & {s}) = 0
       THEN (CASE WHEN (x & {s}) > 0 THEN {s} - 1 - y ELSE y END)
       ELSE x END AS x,
  CASE WHEN (y & {s}) = 0
       THEN (CASE WHEN (x & {s}) > 0 THEN {s} - 1 - x ELSE x END)
       ELSE y END AS y
  FROM {prev})""")
        prev = f"hs{i}"
    return ",".join(steps), prev


def _hilbert_oracle() -> str:
    steps, last = _hilbert_sql_steps()
    grid = 1 << _gx_mod.HILBERT_BITS
    return _WG + f""",
hq AS (SELECT
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * {grid}.0)
                      AS BIGINT), 0), {grid - 1}) AS x,
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * {grid}.0)
                      AS BIGINT), 0), {grid - 1}) AS y,
  CAST(0 AS BIGINT) AS d
  FROM geo),{steps}
SELECT d >> {_gx_mod.HILBERT_PREFIX_SHIFT} AS hprefix,
       COUNT(*) AS n_pages
FROM {last} GROUP BY 1"""


def _minhash_sql_chain() -> str:
    """Shared CTE chain: documents -> token 3-gram shingles -> MinHash
    signatures -> LSH band keys -> candidate pairs.  Exact mirror of
    dedup.py's derandomized mod-Mersenne-31 family (md5 token hashes,
    LCG mixing constants, universal-hash coefficients embedded as
    literals) — all operands < 2^31 so every product is BIGINT-safe."""
    assert _dedup.NUM_PERM // _dedup.NUM_BANDS == 4  # SQL pivots 4 rows
    M = _dedup.MERSENNE
    KB = _dedup.BAND_KB

    def th(x: str) -> str:
        return f"(('0x' || substr(md5({x}),1,15))::BIGINT % {M})"

    perm_vals = ", ".join(
        f"({p}, {a}, {b})" for p, (a, b) in enumerate(
            zip(_dedup.MINHASH_A.tolist(), _dedup.MINHASH_B.tolist())))
    return f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
tpos AS (SELECT doc_id, unnest(generate_series(1, len(ts) - 2)) AS i, ts
         FROM toks),
sh AS (SELECT DISTINCT doc_id, sh FROM (
       SELECT doc_id,
        ({th('ts[i]')} * {_dedup.SH_C1} % {M}
         + {th('ts[i+1]')} * {_dedup.SH_C2} % {M}
         + {th('ts[i+2]')} * {_dedup.SH_C3} % {M}) % {M} AS sh
       FROM tpos
       UNION ALL
       -- short-doc fallback (dedup._token_hashes: fold of all tokens
       -- when fewer than SHINGLE_K; split('') is [''] so len >= 1)
       SELECT doc_id,
        CASE WHEN len(ts) = 1 THEN {th('ts[1]')}
             ELSE ({th('ts[1]')} * {_dedup.SH_C2} % {M}
                   + {th('ts[2]')}) % {M} END AS sh
       FROM toks WHERE len(ts) < 3)),
perms AS (SELECT CAST(col0 AS BIGINT) AS perm, CAST(col1 AS BIGINT) AS a,
                 CAST(col2 AS BIGINT) AS b
          FROM (VALUES {perm_vals}) v(col0, col1, col2)),
sigs AS (SELECT doc_id, perm, MIN((a * sh + b) % {M}) AS sig
         FROM sh CROSS JOIN perms GROUP BY doc_id, perm),
segs AS (SELECT doc_id, perm // 4 AS band,
                MIN(CASE WHEN perm % 4 = 0 THEN sig END) AS s0,
                MIN(CASE WHEN perm % 4 = 1 THEN sig END) AS s1,
                MIN(CASE WHEN perm % 4 = 2 THEN sig END) AS s2,
                MIN(CASE WHEN perm % 4 = 3 THEN sig END) AS s3
         FROM sigs GROUP BY doc_id, perm // 4),
bkeys AS (SELECT doc_id, band,
        ((((s0 * {KB} % {M} + s1) % {M}) * {KB} % {M} + s2) % {M}
         * {KB} % {M} + s3) % {M} AS band_key
          FROM segs),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bkeys a JOIN bkeys b
           ON a.band = b.band AND a.band_key = b.band_key
          AND a.doc_id < b.doc_id)"""


def _simhash_chain_sql() -> str:
    """SimHash CTE chain: three LCG mixes of the 31-bit shingle hash
    give the 64 vote bits (31+31+2); ``simt`` holds the assembled
    two's-complement BIGINT bit pattern plus 4x16-bit segments.
    power(2, b) is exact in float64 for all b <= 63."""
    M = _dedup.MERSENNE
    return f""",
mix AS (SELECT doc_id,
               (sh * {_dedup.SIM_G1} + {_dedup.SIM_H1}) % {M} AS g1,
               (sh * {_dedup.SIM_G2} + {_dedup.SIM_H2}) % {M} AS g2,
               (sh * {_dedup.SIM_G3} + {_dedup.SIM_H3}) % {M} AS g3
        FROM sh),
bits AS (SELECT unnest(generate_series(0, 63)) AS b),
votes AS (SELECT doc_id, b,
    SUM(CASE WHEN (CASE
          WHEN b < 31 THEN (g1 // CAST(power(2, b) AS BIGINT)) % 2
          WHEN b < 62 THEN (g2 // CAST(power(2, b - 31) AS BIGINT)) % 2
          ELSE (g3 // CAST(power(2, b - 62) AS BIGINT)) % 2 END) = 1
        THEN 1 ELSE -1 END) AS v
          FROM mix CROSS JOIN bits GROUP BY doc_id, b),
sim AS (SELECT doc_id,
               SUM(CASE WHEN v > 0 THEN CAST(power(2, b) AS HUGEINT)
                        ELSE 0 END) AS s
        FROM votes GROUP BY doc_id),
simt AS (SELECT doc_id,
       CAST(CASE WHEN s >= 9223372036854775808
                 THEN s - 18446744073709551616::HUGEINT
                 ELSE s END AS BIGINT) AS simhash,
       CAST((s // 1) % 65536 AS BIGINT) AS seg0,
       CAST((s // 65536) % 65536 AS BIGINT) AS seg1,
       CAST((s // 4294967296) % 65536 AS BIGINT) AS seg2,
       CAST((s // 281474976710656) % 65536 AS BIGINT) AS seg3
FROM sim)"""


def _simhash_sql() -> str:
    return _simhash_chain_sql() + """
SELECT doc_id, simhash, seg0, seg1, seg2, seg3 FROM simt"""


def _simhash_pairs_sql() -> str:
    """simhash_pairs mirror: unpivot the 4 segments, same-segment
    candidate join (doc_a < doc_b), DISTINCT pair, exact Hamming via
    bit_count(xor(...)) on the two's-complement bit patterns (DuckDB's
    BIGINT xor/bit_count operate on the raw 64-bit pattern — same as
    the engine's uint64 popcount)."""
    return _simhash_chain_sql() + f""",
simsegs AS (
  SELECT doc_id, simhash, k, seg FROM (
    SELECT doc_id, simhash, k.k,
           CASE k.k WHEN 0 THEN seg0 WHEN 1 THEN seg1
                    WHEN 2 THEN seg2 ELSE seg3 END AS seg,
           -- engine's SIM_BUCKET_CAP recall guard: each LSH bucket is
           -- truncated to the cap smallest doc_ids (dedup.py)
           row_number() OVER (PARTITION BY k.k,
             CASE k.k WHEN 0 THEN seg0 WHEN 1 THEN seg1
                      WHEN 2 THEN seg2 ELSE seg3 END
             ORDER BY doc_id) AS rn
    FROM simt, (VALUES (0), (1), (2), (3)) k(k))
  WHERE rn <= {_dedup.SIM_BUCKET_CAP}),
simcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM simsegs a JOIN simsegs b
    ON a.k = b.k AND a.seg = b.seg AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM simcand WHERE bit_count(xor(ha, hb)) <= {_dedup.SIM_MAX_HAMMING}"""


def _s2_sql() -> str:
    """S2 level-12 cell mirror: lat/lon -> XYZ (trig; numpy and DuckDB
    share the platform libm, so the same expression order is bit-exact
    here) -> face/(u,v) gnomonic -> quadratic ST -> 12-step Hilbert
    walk as a recursive CTE with the engine's own traversal tables
    (cells._IJ_TO_POS / _POS_TO_ORIENTATION) inlined as CASEs.
    Requires a WITH RECURSIVE prefix (_WGR)."""
    from geo_inference_ray import cells as _cells

    ij2pos = _cells._IJ_TO_POS
    p2o = _cells._POS_TO_ORIENTATION
    pcase = ("CASE orientation * 4 + (ib * 2 + jb) "
             + " ".join(f"WHEN {o * 4 + ij} THEN {ij2pos[o, ij]}"
                        for o in range(4) for ij in range(4)) + " END")
    ocase = ("CASE pp " + " ".join(f"WHEN {p} THEN {p2o[p]}"
                                   for p in range(4)) + " END")
    level = _cells.S2_LEVEL
    shift = 2 * (_cells._MAX_LEVEL - level)
    n = 1 << level
    return f"""
xyz AS (
  SELECT doc_id,
         cos(radians(lat)) * cos(radians(lon)) AS x,
         cos(radians(lat)) * sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
  FROM geo),
f0 AS (
  SELECT doc_id, x, y, z,
    CASE WHEN abs(x) >= abs(y)
         THEN CASE WHEN abs(x) >= abs(z) THEN 0 ELSE 2 END
         ELSE CASE WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END END AS fa
  FROM xyz),
fc AS (
  SELECT doc_id, x, y, z,
    fa + CASE WHEN (CASE fa WHEN 0 THEN x WHEN 1 THEN y ELSE z END) < 0
              THEN 3 ELSE 0 END AS face
  FROM f0),
uv AS (
  SELECT doc_id, face,
    CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
              WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
    CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
              WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
  FROM fc),
st AS (
  SELECT doc_id, face,
    CASE WHEN u >= 0 THEN 0.5 * sqrt(GREATEST(1.0 + 3.0 * u, 0.0))
         ELSE 1.0 - 0.5 * sqrt(GREATEST(1.0 - 3.0 * u, 0.0)) END AS su,
    CASE WHEN v >= 0 THEN 0.5 * sqrt(GREATEST(1.0 + 3.0 * v, 0.0))
         ELSE 1.0 - 0.5 * sqrt(GREATEST(1.0 - 3.0 * v, 0.0)) END AS sv
  FROM uv),
ij AS (
  SELECT doc_id, face,
    LEAST(GREATEST(CAST(trunc(su * {n}) AS BIGINT), 0), {n - 1}) AS i,
    LEAST(GREATEST(CAST(trunc(sv * {n}) AS BIGINT), 0), {n - 1}) AS j
  FROM st),
walk AS (
  SELECT doc_id, face, i, j, {level} AS k,
         face % 2 AS orientation, CAST(0 AS BIGINT) AS pos
  FROM ij
  UNION ALL
  SELECT doc_id, face, i, j, k - 1,
         xor(orientation, {ocase}), pos * 4 + pp
  FROM (
    SELECT doc_id, face, i, j, k, orientation, pos, {pcase} AS pp
    FROM (
      SELECT doc_id, face, i, j, k, orientation, pos,
             (i // CAST(power(2, k - 1) AS BIGINT)) % 2 AS ib,
             (j // CAST(power(2, k - 1) AS BIGINT)) % 2 AS jb
      FROM walk WHERE k > 0))
)
SELECT doc_id,
       CAST(CAST(face AS HUGEINT) * {1 << 61}
            + CAST(pos AS HUGEINT) * {1 << (shift + 1)}
            + {1 << shift} AS UBIGINT) AS s2_12
FROM walk WHERE k = 0"""


def _pq_oracle() -> str:
    """Generated PQ mirror: the kmeans oracle's 2-iteration Lloyd CTE
    chain instantiated once per dim subspace (filtered on the carried
    vector length, so the SQL adapts to any d divisible by PQ_SUBS),
    UNION ALL'd with a literal sub id — mirrors ann.pq_codes
    bit-for-bit (same seeds, ties, floor(double/double) update)."""
    n = _ann.PQ_SUBS
    parts = [f"""WITH elems AS (
  SELECT vec_id, g.i AS dim, len(embedding) AS d,
         CAST(floor(CAST(embedding[g.i] AS DOUBLE) * {_ann.KMEANS_SCALE}.0)
              AS BIGINT) AS qx
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
seeds AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
          FROM (SELECT vec_id FROM embeddings
                ORDER BY vec_id LIMIT {_ann.KMEANS_K}))"""]
    for s in range(n):
        parts.append(f""",
e{s} AS (SELECT vec_id, dim, qx FROM elems
         WHERE dim > {s} * (d // {n}) AND dim <= {s + 1} * (d // {n})),
c0_{s} AS (SELECT s.cid, e.dim, e.qx AS qc
           FROM seeds s JOIN e{s} e USING (vec_id)),
d1_{s} AS (SELECT e.vec_id, c.cid,
                  SUM((e.qx - c.qc) * (e.qx - c.qc)) AS dist
           FROM e{s} e JOIN c0_{s} c ON c.dim = e.dim
           GROUP BY e.vec_id, c.cid),
a1_{s} AS (SELECT vec_id, cid FROM (
             SELECT vec_id, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id
                                       ORDER BY dist, cid) AS rn
             FROM d1_{s}) WHERE rn = 1),
m1_{s} AS (SELECT a.cid, e.dim,
                  CAST(floor(CAST(SUM(e.qx) AS DOUBLE)
                             / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS qc
           FROM a1_{s} a JOIN e{s} e USING (vec_id)
           GROUP BY a.cid, e.dim),
c1_{s} AS (SELECT c0_{s}.cid, c0_{s}.dim,
                  COALESCE(m1_{s}.qc, c0_{s}.qc) AS qc
           FROM c0_{s} LEFT JOIN m1_{s}
             ON m1_{s}.cid = c0_{s}.cid AND m1_{s}.dim = c0_{s}.dim),
d2_{s} AS (SELECT e.vec_id, c.cid,
                  SUM((e.qx - c.qc) * (e.qx - c.qc)) AS dist
           FROM e{s} e JOIN c1_{s} c ON c.dim = e.dim
           GROUP BY e.vec_id, c.cid),
f{s} AS (SELECT vec_id, CAST({s} AS BIGINT) AS sub,
                CAST(cid AS BIGINT) AS code, CAST(dist AS BIGINT) AS dist
         FROM (SELECT vec_id, cid, dist,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cid) AS rn
               FROM d2_{s}) WHERE rn = 1)""")
    parts.append("\n" + "\nUNION ALL\n".join(
        f"SELECT * FROM f{s}" for s in range(n)))
    return "".join(parts)


def _s2_compact_oracle() -> str:
    """s2_compact mirror: rewrap _s2_sql's final SELECT as a CTE, then
    pure-integer parent extraction — a level-12 id is
    ``face<<61 | pos<<37 | 1<<36``, so its level-11 parent is
    ``(id // 2^39) * 2^39 + 2^38`` (clear the child's 2 position bits
    + lsb, set the coarser lsb), identical to cells.s2_parent's
    bitwise form.  A parent with all 4 children populated compacts;
    anything else passes its children through at level 12."""
    full = _s2_sql()
    head, tail = full.rsplit("SELECT doc_id,", 1)
    two39 = 1 << 39
    two38 = 1 << 38
    return (_WGR + "," + head.rstrip()
            + ",\ns2c AS (SELECT doc_id," + tail + ")" + f""",
c12 AS (SELECT DISTINCT s2_12 FROM s2c),
par AS (SELECT s2_12,
               CAST(s2_12 // {two39} * {two39} + {two38} AS UBIGINT)
                 AS parent
        FROM c12),
pc AS (SELECT parent, count(*) AS nch FROM par GROUP BY parent)
SELECT parent AS cell, CAST(11 AS BIGINT) AS level
FROM pc WHERE nch = 4
UNION ALL
SELECT p.s2_12 AS cell, CAST(12 AS BIGINT) AS level
FROM par p JOIN pc ON p.parent = pc.parent
WHERE pc.nch < 4""")


def oracle_sql() -> dict[str, str]:
    marker_scores = _langid_scores_sql()
    lang_case = ("CASE WHEN score_en >= score_de AND score_en >= score_fr "
                 "AND score_en >= score_zh THEN 'en' "
                 "WHEN score_de >= score_fr AND score_de >= score_zh THEN 'de' "
                 "WHEN score_fr >= score_zh THEN 'fr' ELSE 'zh' END")
    # Q19 disjunction generated from the SAME arm table the engine uses
    q19_arms = " OR ".join(
        "(" + " AND ".join(
            ([f"p.p_brand = '{brand}'"] if brand is not None else [])
            + ([f"p.p_size >= {size}"] if size is not None else [])
            + [f"CAST(round(l.l_quantity) AS BIGINT) "
               f"BETWEEN {lo} AND {hi}"]) + ")"
        for brand, size, lo, hi in _rel_mod.Q19_ARMS)
    return {
        "pages": _W + " SELECT url, warc_ts, text, lang, doc_id FROM pages",
        "extract_text": _W + " SELECT url, doc_id, text FROM pages",
        "geocode": _WG + " SELECT url, doc_id, cluster, lat, lon FROM geo",
        "hex_cells": _WH + " SELECT doc_id, hex7, hex9 FROM hex9",
        "s2_cells": _WGR + "," + _s2_sql(),
        "pip_inner": _WP + (" SELECT url, doc_id, lat, lon, hex7, poly_id,"
                            " class_id FROM pip"),
        "pip_semi": _WP + (" SELECT DISTINCT doc_id, lat, lon FROM pip"),
        "pip_left": _WP + """,
firsts AS (SELECT doc_id, min(poly_id) AS poly_id FROM pip GROUP BY doc_id)
SELECT g.doc_id, COALESCE(f.poly_id, -1) AS poly_id
FROM geo g LEFT JOIN firsts f ON g.doc_id = f.doc_id""",
        "cell_agg": _WH + """
SELECT hex7, count(*) AS n_pages,
       min(lat) AS min_lat, max(lat) AS max_lat,
       min(lon) AS min_lon, max(lon) AS max_lon
FROM hex9 GROUP BY hex7""",
        "knn_cell": _WH + f""",
knn AS (
  SELECT a.doc_id, b.doc_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.doc_id
           ORDER BY (a.lat - b.lat) * (a.lat - b.lat)
                    + (a.lon - b.lon) * (a.lon - b.lon), b.doc_id
         ) AS "rank"
  FROM hex9 a JOIN hex9 b ON a.hex7 = b.hex7 AND a.doc_id != b.doc_id
)
SELECT doc_id, neighbor_id, "rank" FROM knn WHERE "rank" <= {_knn.K_DEFAULT}""",
        "manifest": """
SELECT '/data/aoi_' || CAST(p_partkey AS VARCHAR) || '.tif' AS tif,
       '/data/aoi_' || CAST(p_partkey AS VARCHAR) || '.gpkg' AS gpkg,
       CASE p_partkey % 3 WHEN 0 THEN 'trn' WHEN 1 THEN 'tst'
            ELSE 'val' END AS split,
       p_partkey AS aoi_id
FROM part""",
        "knn_ring1": _WH + f""",
knn AS (
  SELECT a.doc_id, b.doc_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.doc_id
           ORDER BY (a.lat - b.lat) * (a.lat - b.lat)
                    + (a.lon - b.lon) * (a.lon - b.lon), b.doc_id
         ) AS "rank"
  FROM hex9 a JOIN hex9 b
    ON (b.hex7 - a.hex7) IN (0, 1, -1, 65536, -65536, 65535, -65535)
   AND a.doc_id != b.doc_id
)
SELECT doc_id, neighbor_id, "rank" FROM knn WHERE "rank" <= {_knn.K_DEFAULT}""",
        "dedup_exact": """
SELECT md5(text) AS text_md5, min(doc_id) AS doc_id
FROM documents GROUP BY md5(text)""",
        "token_count": """
SELECT doc_id,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
FROM documents""",
        "token_regex": """
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
         AS n_word,
       CAST(length(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
         AS n_num,
       CAST(length(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
         AS n_punct,
       CAST(length(regexp_extract_all(text, '[A-Za-z]+'))
            + length(regexp_extract_all(text, '[0-9]+'))
            + length(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
         AS n_bpe_tokens
FROM documents""",
        "quality": """
SELECT doc_id, length(text) AS n_chars,
       length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
       ((length(text) - (length(text) - length(replace(text, ' ', '')))) * 1000)
         // (length(text) - length(replace(text, ' ', '')) + 1)
         AS mean_tok_len_milli
FROM documents""",
        "langid": f"""
WITH padded AS (SELECT doc_id, ' ' || text || ' ' AS padded FROM documents),
scores AS (SELECT doc_id, {marker_scores} FROM padded)
SELECT doc_id, {lang_case} AS pred_lang,
       score_en, score_de, score_fr, score_zh
FROM scores""",
        "rasterize": _WG + """
SELECT CAST(floor((lon - -180.0) / 0.5) AS BIGINT) AS px,
       CAST(floor((90.0 - lat) / 0.5) AS BIGINT) AS py,
       count(*) AS n
FROM geo GROUP BY 1, 2""",
        "mask_tiles": _WG + "," + _tiling_sql_mask_tiles(),
        "tile_pyramid": _WG + "," + _tiling_sql_tile_pyramid(),
        "zonal_stats": (_WG + "," + _tiling_sql_pix_cte() + ","
                        + _synth.sql_polygon_edges()
                        + _tiling_sql_zonal_stats()),
        "polygon_components": _WGR + "," + _tiling_sql_polygon_components(),
        "polygon_rings": _WGR + "," + _tiling_sql_polygon_rings(),
        "yolo": _WGR + "," + _tiling_sql_yolo(),
        "polygons": _WGR + "," + _tiling_sql_polygons(),
        "polygons_dist": _WGR + "," + _tiling_sql_polygons(),
        "coco_annotations": _WGR + "," + _tiling_sql_coco(),
        "word_count": """
SELECT token, COUNT(*) AS n FROM (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
) GROUP BY token ORDER BY n DESC, token LIMIT 20""",
        # Connected components over the candidate-pair graph: recursive
        # label reachability (the polygonize min-label pattern), cluster
        # = min doc_id reachable.  Needs WITH RECURSIVE.
        "dedup_clusters": "WITH RECURSIVE "
        + _minhash_sql_chain().lstrip() + """,
edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
          UNION ALL SELECT doc_b, doc_a FROM cand),
reach(n, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n
)
SELECT n AS doc_id, MIN(l) AS cluster FROM reach GROUP BY n""",
        # Dedup end product: the corpus minus non-representative cluster
        # members — reuses the recursive reachability CC as a CTE.
        "dedup_apply": "WITH RECURSIVE "
        + _minhash_sql_chain().lstrip() + """,
edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
          UNION ALL SELECT doc_b, doc_a FROM cand),
reach(n, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n
),
cc AS (SELECT n AS doc_id, MIN(l) AS cluster FROM reach GROUP BY n)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN cc ON cc.doc_id = d.doc_id
WHERE cc.doc_id = cc.cluster""",
        # Corpus-wide top-k bigrams (n-gram LM count table).
        "ngram_topk": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT t[g.i] || ' ' || t[g.i + 1] AS ngram
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
)
SELECT ngram, COUNT(*) AS n FROM grams
GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20""",
        # Per-doc top-k tf-idf terms: integer milli-nat idf (same-libm
        # ln, identical expression order — see the transcendental
        # contract probe test), row_number tie-broken on the ASCII
        # token so pandas and DuckDB sort identically.
        "tfidf_topk": """
WITH flat AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
toks AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM flat GROUP BY doc_id, token),
dfs AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.token,
         t.tf * CAST(floor(1000.0 * ln(CAST(nd.n_docs AS DOUBLE)
                                       / CAST(d.df AS DOUBLE))) AS BIGINT)
             AS score_milli
  FROM toks t JOIN dfs d ON d.token = t.token, nd),
ranked AS (
  SELECT doc_id, token, score_milli,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_milli DESC, token) AS rk
  FROM scored)
SELECT doc_id, token, score_milli, rk FROM ranked WHERE rk <= 3""",
        # Context-window chunking: stride = 24 (32-token chunks, 8
        # overlap); starts advance while < n_tokens.  s is always a
        # multiple of the stride so the // is exact.
        "chunk_docs": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id, s.s // 24 AS chunk_id,
         list_slice(t, s.s + 1, s.s + 32) AS ct
  FROM toks, unnest(generate_series(0, len(t) - 1, 24)) AS s(s)
)
SELECT doc_id, chunk_id, len(ct) AS n_chunk_tokens,
       array_to_string(ct, ' ') AS chunk_text
FROM chunks""",
        # Sequence packing: exclusive prefix-sum of token counts in
        # doc_id order // seq length (integer // = floor, matching the
        # engine's int64 floor division — CAST(double) would ROUND).
        "pack_sequences": """
WITH n AS (
  SELECT doc_id,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
  FROM documents),
p AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
  FROM n)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(pre // 512 AS BIGINT) AS pack_id FROM p""",
        # Benchmark decontamination: distinct token trigrams shared
        # with the self-derived benchmark set (doc_id % 97 == 0).
        # Bigram conditional surprisal: P(w2|w1) from the corpus bigram
        # table; per-bigram integer milli-nats (same-libm ln, identical
        # expression order), tf-weighted per-doc sum.
        "bigram_surprisal": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
bg AS (SELECT doc_id, ts[g.i] AS w1, ts[g.i] || ' ' || ts[g.i + 1] AS b
       FROM t, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
bpairs AS (SELECT doc_id, b, COUNT(*) AS tf FROM bg GROUP BY doc_id, b),
cb AS (SELECT b, MIN(w1) AS w1, COUNT(*) AS n FROM bg GROUP BY b),
cw AS (SELECT w1, SUM(n) AS cn FROM cb GROUP BY w1),
sc AS (SELECT cb.b,
              CAST(floor(-1000.0 * ln(CAST(cb.n AS DOUBLE)
                                      / CAST(cw.cn AS DOUBLE)))
                   AS BIGINT) AS s
       FROM cb JOIN cw USING (w1))
SELECT p.doc_id,
       CAST(SUM(sc.s * p.tf) AS BIGINT) AS bigram_surprisal_milli,
       CAST(SUM(p.tf) AS BIGINT) AS n_bigrams
FROM bpairs p JOIN sc ON sc.b = p.b GROUP BY p.doc_id""",
        "decontaminate": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         t[g.i] || ' ' || t[g.i + 1] || ' ' || t[g.i + 2] AS g
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS g(i)),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
ov AS (SELECT gr.doc_id, COUNT(*) AS n
       FROM grams gr JOIN bench b USING (g) GROUP BY gr.doc_id)
SELECT d.doc_id, COALESCE(o.n, 0) AS n_overlap,
       CAST(CASE WHEN d.doc_id % 97 = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS is_benchmark
FROM documents d LEFT JOIN ov o ON o.doc_id = d.doc_id""",
        # Chunk-level corpus dedup: 32-token non-overlapping chunks,
        # each distinct chunk text kept at its first (doc_id, chunk_id).
        "chunk_dedup": """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
chunks AS (
  SELECT doc_id, s.s // 32 AS chunk_id,
         array_to_string(list_slice(t, s.s + 1, s.s + 32), ' ') AS ct
  FROM toks, unnest(generate_series(0, len(t) - 1, 32)) AS s(s)),
w AS (SELECT doc_id, chunk_id,
        ROW_NUMBER() OVER (PARTITION BY ct
                           ORDER BY doc_id, chunk_id) AS rn
      FROM chunks)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM w GROUP BY doc_id""",
        # Exact global p90 length threshold filter: the quantile is the
        # ceil(0.9*n)-th smallest n_chars (double math both sides).
        "quality_filter": """
WITH n AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
           FROM documents),
r AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) AS rn FROM n),
c AS (SELECT COUNT(*) AS total FROM n),
thr AS (SELECT r.n_chars AS t FROM r, c
        WHERE r.rn = CAST(ceil(0.9 * total) AS BIGINT))
SELECT doc_id, n_chars FROM n, thr WHERE n_chars >= thr.t""",
        # Inverted index: token -> df + comma-joined sorted postings.
        "inverted_index": """
WITH flat AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
pairs AS (SELECT DISTINCT doc_id, token FROM flat)
SELECT token, COUNT(*) AS df,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
FROM pairs GROUP BY token""",
        # Deterministic training shuffle: hash shard + exact in-shard
        # rank (mod-before-multiply keeps the hash BIGINT-safe).
        "train_shuffle": """
WITH h AS (SELECT doc_id,
                  (doc_id % 2147483647 * 2654435761) % 2147483647 AS h
           FROM documents)
SELECT doc_id, h % 8 AS shard,
       ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) AS pos
FROM h""",
        # Stratified per-source sample: reproducible hash rank, k per
        # stratum (mod-before-multiply keeps the rank hash BIGINT-safe).
        "stratified_sample": """
WITH r AS (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (doc_id % 2147483647 * 2654435761) % 2147483647,
                    doc_id) AS rnk
  FROM documents)
SELECT source, doc_id, rnk FROM r WHERE rnk <= 5""",
        # Unigram surprisal: per-token integer milli-nats (same-libm ln,
        # identical expression order) summed per doc — order-independent
        # because the integerization happens before the sum.
        "surprisal": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
cnts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
total AS (SELECT COUNT(*) AS t FROM toks)
SELECT k.doc_id,
       CAST(SUM(CAST(floor(-1000.0 * ln(CAST(c.n AS DOUBLE)
                                        / CAST(total.t AS DOUBLE)))
                     AS BIGINT)) AS BIGINT) AS surprisal_milli,
       COUNT(*) AS n_tokens
FROM toks k JOIN cnts c ON c.token = k.token, total
GROUP BY k.doc_id""",
        # Exact discrete quantiles: the ceil(q*n) rank uses the same
        # double multiply as the engine, so ties in the float index are
        # impossible to diverge.
        "length_quantiles": """
WITH ord AS (
  SELECT length(text) AS L,
         ROW_NUMBER() OVER (ORDER BY length(text)) AS rn,
         COUNT(*) OVER () AS n
  FROM documents
)
SELECT MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN L END) AS p50,
       MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN L END) AS p90,
       MAX(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT) THEN L END) AS p99
FROM ord""",
        # Duplicate-shingle ratio: reuses the minhash CTE chain (same
        # token 3-gram hash family), pure integer arithmetic.
        "repetition": "WITH " + _minhash_sql_chain() + """,
tot AS (SELECT doc_id, GREATEST(len(ts) - 2, 1) AS n_shingles FROM toks),
dis AS (SELECT doc_id, COUNT(*) AS n_distinct FROM sh GROUP BY doc_id)
SELECT t.doc_id, t.n_shingles, d.n_distinct,
       1000 * (t.n_shingles - d.n_distinct) // t.n_shingles AS rep_milli
FROM tot t JOIN dis d USING (doc_id)""",
        "source_stats": _W + """
SELECT string_split(url, '/')[4] AS src,
       COUNT(*) AS n_pages,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
            AS BIGINT) AS total_tokens
FROM pages GROUP BY 1""",
        # Host-level crawl rollup: same url grammar as the engine's
        # vectorized extract_regex (scheme://host/seg).
        "host_stats": _W + """
SELECT regexp_extract(url, '^([a-z0-9+.-]+)://([^/]+)/([^/]*)', 2)
           AS host,
       regexp_extract(url, '^([a-z0-9+.-]+)://([^/]+)/([^/]*)', 3)
           AS seg,
       COUNT(*) AS n_pages,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM pages GROUP BY 1, 2""",
        # CCNet head/middle/tail split: exact length tertiles, same
        # double arithmetic (k * n / 3.0, ceil) as textops.ccnet_buckets.
        "ccnet_buckets": """
WITH n AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
           FROM documents),
r AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) AS rn FROM n),
c AS (SELECT COUNT(*) AS total FROM n),
t1 AS (SELECT r.n_chars AS t FROM r, c
       WHERE r.rn = CAST(ceil(1.0 * total / 3.0) AS BIGINT)),
t2 AS (SELECT r.n_chars AS t FROM r, c
       WHERE r.rn = CAST(ceil(2.0 * total / 3.0) AS BIGINT))
SELECT n.doc_id, n.n_chars,
       CASE WHEN n.n_chars > t2.t THEN 'head'
            WHEN n.n_chars > t1.t THEN 'middle'
            ELSE 'tail' END AS bucket
FROM n, t1, t2""",
        # Exact substring-span duplication: DISTINCT word 3-grams per
        # doc, flagged when the gram appears in >1 document.  Grouping
        # is on the exact gram STRING in both engines, so counts match
        # bit-for-bit (DuckDB list slice w[i:i+2] is 1-based inclusive
        # = a 3-token window).
        "dup_spans": """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i : i+2], ' ') AS g
  FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 3
),
df AS (SELECT g, COUNT(*) AS nd FROM grams GROUP BY g)
SELECT grams.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN df.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
FROM grams JOIN df USING (g)
GROUP BY grams.doc_id""",
        # Temperature-balanced source mixing: integer arithmetic end to
        # end except the IEEE sqrt (identical in numpy and DuckDB).
        "mix_sample": f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
w AS (SELECT source, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS ws FROM c),
tot AS (SELECT CAST(SUM(ws) AS BIGINT) AS tw FROM w),
t AS (SELECT source, n,
             ({_textops.MIX_TARGET_DOCS} * ws) // tw AS ts FROM w, tot)
SELECT d.doc_id, d.source
FROM documents d JOIN t USING (source)
WHERE ((d.doc_id % {_textops.MIX_HMOD}) * {_textops.MIX_HMULT}
       + {_textops.MIX_HADD}) % {_textops.MIX_HMOD} % t.n < t.ts""",
        # Second-moment mergeable aggregate: integer sufficient
        # statistics (n, Σq, Σd, Σq², Σd², Σqd), float finish with the
        # SAME expression tree as relational.corr_stats (bitwise-equal
        # IEEE doubles).
        "corr_stats": """
WITH m AS (
  SELECT l_returnflag,
    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) sq,
    CAST(SUM(CAST(round(l_discount*10000) AS BIGINT)) AS BIGINT) sd,
    CAST(SUM(CAST(round(l_quantity) AS BIGINT)
           * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) sqq,
    CAST(SUM(CAST(round(l_discount*10000) AS BIGINT)
           * CAST(round(l_discount*10000) AS BIGINT)) AS BIGINT) sdd,
    CAST(SUM(CAST(round(l_quantity) AS BIGINT)
           * CAST(round(l_discount*10000) AS BIGINT)) AS BIGINT) sqd,
    COUNT(*) n
  FROM lineitem GROUP BY l_returnflag),
f AS (
  SELECT l_returnflag, n,
    CAST(n AS DOUBLE)*CAST(sqq AS DOUBLE)
      - CAST(sq AS DOUBLE)*CAST(sq AS DOUBLE) AS covq,
    CAST(n AS DOUBLE)*CAST(sdd AS DOUBLE)
      - CAST(sd AS DOUBLE)*CAST(sd AS DOUBLE) AS covd,
    CAST(n AS DOUBLE)*CAST(sqd AS DOUBLE)
      - CAST(sq AS DOUBLE)*CAST(sd AS DOUBLE) AS covqd
  FROM m)
SELECT l_returnflag, n,
  CASE WHEN covq * covd > 0.0
       THEN covqd / sqrt(covq * covd) ELSE 0.0 END AS corr_qd,
  covqd / (CAST(n AS DOUBLE)*CAST(n AS DOUBLE)) AS covar_pop_qd,
  sqrt(covq) / CAST(n AS DOUBLE) AS std_q,
  sqrt(covd) / CAST(n AS DOUBLE) AS std_d
FROM f""",
        # Keyed set EXCEPT, both sides corpus-scale.  Day key =
        # epoch-microseconds // 86400e6 (integer floor, both sides).
        "except_days": """
SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
FROM events WHERE event_type = 'signup'""",
        # Running window sum/count per user; the engine emits only the
        # event_id % 41 sample rows but accumulates over ALL rows.
        "running_total": """
SELECT event_id, user_id,
  CAST(SUM(CAST(round(value*1000) AS BIGINT)) OVER w AS BIGINT)
    AS run_value_milli,
  COUNT(*) OVER w AS run_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
QUALIFY event_id % 41 = 0""",
        # Fixed-width ROWS frame per user; sampled output rows, full
        # frames (mirrors running_total's QUALIFY sampling).
        "moving_window": f"""
SELECT event_id, user_id,
  CAST(SUM(CAST(round(value*1000) AS BIGINT)) OVER w AS BIGINT)
    AS win_value_milli,
  COUNT(*) OVER w AS win_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {_rel_mod.MW_FRAME_PRECEDING} PRECEDING
                  AND CURRENT ROW)
QUALIFY event_id % {_rel_mod.MW_SAMPLE_MOD} = 0""",
        # Range/band join: irregular quadratic edges generated in a
        # CTE; the engine resolves bands via broadcast searchsorted.
        "range_join": f"""
WITH bands AS (
  SELECT k AS band_id,
         k * k * {_rel_mod.RJ_BAND_CENTS} AS lo,
         CASE WHEN k = {_rel_mod.RJ_NUM_BANDS - 1}
              THEN 9223372036854775807
              ELSE (k+1) * (k+1) * {_rel_mod.RJ_BAND_CENTS} END AS hi
  FROM range({_rel_mod.RJ_NUM_BANDS}) t(k)),
oc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS pc FROM orders)
SELECT b.band_id, COUNT(*) AS n_orders,
       CAST(SUM(oc.pc) AS BIGINT) AS sum_price_cents,
       MIN(oc.pc) AS min_price_cents, MAX(oc.pc) AS max_price_cents
FROM oc JOIN bands b ON oc.pc >= b.lo AND oc.pc < b.hi
GROUP BY b.band_id""",
        # Regex redaction: DuckDB's RE2 is the same engine as the
        # Arrow kernels, so redacted text is byte-identical.
        "redact_pii": f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text,
       '{_textops.REDACT_PATTERN}')) AS BIGINT) AS n_hits,
  regexp_replace(text, '{_textops.REDACT_PATTERN}',
       '{_textops.REDACT_TOKEN}', 'g') AS text
FROM documents""",
        # ROLLUP: NULL rolled-up dimensions mapped to the engine's
        # '<all>' sentinel (the corpus has no NULL source/lang).
        "rollup_counts": f"""
SELECT COALESCE(source, '{_textops.ROLLUP_ALL}') AS source,
       COALESCE(lang, '{_textops.ROLLUP_ALL}') AS lang,
       COUNT(*) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY ROLLUP(source, lang)""",
        # Wide pivot: conditional aggregation, langs outside the fixed
        # column set count toward n_total only.
        "pivot_counts": """
SELECT source,
  CAST(SUM(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
  CAST(SUM(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
  CAST(SUM(CASE WHEN lang='es' THEN 1 ELSE 0 END) AS BIGINT) AS n_es,
  CAST(SUM(CASE WHEN lang='fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
  CAST(SUM(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS BIGINT) AS n_zh,
  COUNT(*) AS n_total
FROM documents GROUP BY source""",
        # Arg-max row per (lang, source): longest doc, ties -> smallest
        # doc_id (the engine's packed-key Max order).
        "argmax_doc": """
SELECT lang, source, doc_id, n_chars FROM (
  SELECT lang, source, doc_id, n_chars,
    ROW_NUMBER() OVER (PARTITION BY lang, source
                       ORDER BY n_chars DESC, doc_id ASC) rn
  FROM documents) WHERE rn = 1""",
        # Grouped MODE with string tie-break (count desc, token asc) —
        # same whitespace tokenization as word_count.
        "mode_word": """
SELECT lang, token, n FROM (
  SELECT lang, token, n,
    ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n DESC, token ASC) rn
  FROM (SELECT lang, token, COUNT(*) AS n FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS token
    FROM documents) GROUP BY lang, token)
) WHERE rn = 1""",
        # Bloom-prefiltered semi-join: the Bloom stage is pure
        # pruning (exact verify kills false positives), so the oracle
        # is the plain SQL semi-join.
        "bloom_join": """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag""",
        # TPC-H Q3 analog: revenue cents rounded per LINE (same IEEE
        # expression order as the engine), deterministic top-10 via
        # the (revenue DESC, orderkey ASC) tie-break.
        "q3_shipping": f"""
WITH rev AS (
  SELECT l_orderkey,
    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                        + 0.5)
                  AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem
  WHERE epoch_us(l_shipdate) > {_rel_mod.Q3_CUTOFF_US}
  GROUP BY l_orderkey)
SELECT r.l_orderkey, o.o_orderdate, o.o_orderpriority, r.revenue_cents
FROM rev r
JOIN orders o ON o.o_orderkey = r.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{_rel_mod.Q3_SEGMENT}'
  AND epoch_us(o.o_orderdate) < {_rel_mod.Q3_CUTOFF_US}
ORDER BY r.revenue_cents DESC, r.l_orderkey
LIMIT {_rel_mod.Q3_TOPK}""",
        # Confusion matrix: same marker scores + argmax tie-break as
        # the langid oracle, grouped by (label, prediction).
        "lang_confusion": f"""
WITH padded AS (SELECT lang, ' ' || text || ' ' AS padded
                FROM documents),
scores AS (SELECT lang, {marker_scores} FROM padded)
SELECT lang, {lang_case} AS pred_lang, COUNT(*) AS n
FROM scores GROUP BY 1, 2""",
        # Markov transitions: LAG over (ts, event_id) per user; the
        # first event per user has no predecessor.
        "transitions": """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events)
SELECT prev AS from_type, event_type AS to_type, COUNT(*) AS n
FROM s WHERE prev IS NOT NULL GROUP BY 1, 2""",
        # Winsorized stats: ceil(q*n)-th-smallest thresholds, then
        # clipped sums — same quantile convention as quantiles_by_lang.
        "winsorize_stats": f"""
WITH d AS (SELECT lang, n_chars AS L FROM documents),
c AS (SELECT lang, COUNT(*) AS total FROM d GROUP BY lang),
r AS (SELECT lang, L,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY L) AS rnk
      FROM d),
th AS (
  SELECT r.lang,
    MAX(CASE WHEN rnk = CAST(ceil({_textops.WINSOR_LO} * total)
                             AS BIGINT) THEN L END) AS p_lo,
    MAX(CASE WHEN rnk = CAST(ceil({_textops.WINSOR_HI} * total)
                             AS BIGINT) THEN L END) AS p_hi
  FROM r JOIN c USING (lang) GROUP BY r.lang)
SELECT d.lang, MAX(th.p_lo) AS p_lo, MAX(th.p_hi) AS p_hi,
       COUNT(*) AS n,
       CAST(SUM(LEAST(GREATEST(d.L, th.p_lo), th.p_hi)) AS BIGINT)
         AS sum_clipped
FROM d JOIN th ON d.lang = th.lang GROUP BY d.lang""",
        # Week-over-week LAG over the observed week axis; first week
        # emits NULL delta/pct.  DuckDB's integer // TRUNCATES toward
        # zero on negative numerators (numpy // floors) — the engine
        # kernel mirrors the truncation explicitly.
        "weekly_growth": f"""
WITH w AS (SELECT epoch_us(ts) // {_rel_mod.WEEK_US} AS week,
                  COUNT(*) AS n
           FROM events GROUP BY 1),
l AS (SELECT week, n, LAG(n) OVER (ORDER BY week) AS pn FROM w)
SELECT week, n, COALESCE(n - pn, 0) AS delta,
       COALESCE((n - pn) * 1000 // pn, 0) AS pct_milli
FROM l""",
        # TPC-H Q5 analog: local-supply revenue by nation, revenue
        # cents rounded per LINE (engine expression order).
        "q5_local_supply": f"""
SELECT n_name,
  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                      + 0.5)
                AS BIGINT)) AS BIGINT) AS revenue_cents,
  COUNT(*) AS n_lines
FROM customer, orders, lineitem, supplier, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND n_nationkey = c_nationkey
  AND epoch_us(o_orderdate) >= {_rel_mod.Q5_LO_US}
  AND epoch_us(o_orderdate) < {_rel_mod.Q5_HI_US}
GROUP BY n_name""",
        # Multi-term retrieval: summed tf-idf per doc over the fixed
        # query, deterministic (score DESC, doc_id) top-20.
        "search_topk": f"""
WITH flat AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
toks AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM flat
  WHERE token IN {tuple(_textops.SEARCH_TERMS)!r}
  GROUP BY doc_id, token),
dfs AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
sc AS (
  SELECT t.doc_id,
         CAST(SUM(t.tf * CAST(floor(1000.0 *
              ln(CAST(nd.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)))
              AS BIGINT)) AS BIGINT) AS score_milli
  FROM toks t JOIN dfs d ON d.token = t.token, nd
  GROUP BY t.doc_id)
SELECT doc_id, score_milli,
       ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id) AS rk
FROM sc ORDER BY score_milli DESC, doc_id
LIMIT {_textops.SEARCH_TOPK}""",
        # Rendezvous/HRW sharding: literal per-shard universal-hash
        # coefficients (the _hrw_coeffs fixed-seed convention), argmax
        # with ties to the lowest shard id
        "rendezvous_shards": f"""
WITH sh AS (SELECT unnest({list(range(_rel_mod.HRW_SHARDS))}) AS s,
                   unnest({[int(v) for v in _rel_mod.HRW_A]}) AS a,
                   unnest({[int(v) for v in _rel_mod.HRW_B]}) AS b),
sc AS (SELECT d.doc_id, sh.s,
              (sh.a * (d.doc_id % {_rel_mod.HRW_MOD}) + sh.b)
                % {_rel_mod.HRW_MOD} AS h
       FROM documents d CROSS JOIN sh),
pick AS (SELECT doc_id, s FROM (
           SELECT doc_id, s,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY h DESC, s) AS rn
           FROM sc) WHERE rn = 1)
SELECT CAST(s AS BIGINT) AS shard, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM pick GROUP BY s""",
        # Winnowing (SIGMOD '03): k-gram rolling hash with LITERAL
        # power constants (tiny k — no recursive CTE needed), per-
        # window rightmost-min selection via a w-row range join on the
        # window-min, distinct selected positions.  Sentinels for docs
        # under k+w-1 bytes (COALESCE; engine emits the same).
        "winnow_fp": (lambda K, W, M, P: f"""
WITH g AS (
  SELECT doc_id, i,
         ({" + ".join("CAST(ord(substr(text, i + %d, 1)) AS BIGINT)"
                      " * %d" % (j, P[j]) for j in range(K))})
           % {M} AS h
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, strlen(text) - {K - 1}))
                 AS i
        FROM documents)),
mv AS (SELECT doc_id, i,
              MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                           ROWS BETWEEN CURRENT ROW
                           AND {W - 1} FOLLOWING) AS mv,
              COUNT(*) OVER (PARTITION BY doc_id) AS m
       FROM g),
sel AS (SELECT s.doc_id, s.i AS ws, MAX(g2.i) AS pos, s.mv AS h
        FROM (SELECT * FROM mv WHERE i <= m - {W - 1}) s
        JOIN g g2 ON g2.doc_id = s.doc_id
                 AND g2.i BETWEEN s.i AND s.i + {W - 1}
                 AND g2.h = s.mv
        GROUP BY s.doc_id, s.i, s.mv),
fps AS (SELECT DISTINCT doc_id, pos, h FROM sel),
agg AS (SELECT doc_id, COUNT(*) AS n_selected,
               CAST(MIN(h) AS BIGINT) AS fp_min,
               CAST(SUM(h) AS BIGINT) AS fp_sum
        FROM fps GROUP BY doc_id)
SELECT d.doc_id,
       CAST(GREATEST(strlen(d.text) - {K - 1}, 0) AS BIGINT)
         AS n_grams,
       COALESCE(a.n_selected, 0) AS n_selected,
       COALESCE(a.fp_min, -1) AS fp_min,
       COALESCE(a.fp_sum, 0) AS fp_sum
FROM documents d LEFT JOIN agg a USING (doc_id)""")(
            _textops.WINNOW_K, _textops.WINNOW_W, _textops.FP_MOD,
            [pow(_textops.FP_BASE, j, _textops.FP_MOD)
             for j in range(_textops.WINNOW_K)]),
        # Okapi BM25: plus-half idf milli-nats per term, per-term
        # floor after the double division (identical expression order
        # to textops.bm25_topk, spelled term for term)
        "bm25_topk": f"""
WITH flat AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
dls AS (SELECT doc_id, COUNT(*) AS dl FROM flat GROUP BY doc_id),
stats AS (SELECT CAST((SELECT COUNT(*) FROM flat) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                 AS avgdl,
                 (SELECT COUNT(*) FROM documents) AS n_docs),
toks AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM flat
  WHERE token IN {tuple(_textops.SEARCH_TERMS)!r}
  GROUP BY doc_id, token),
dfs AS (SELECT token, COUNT(*) AS df,
               CAST(floor(1000.0 * ln(
                 ((CAST((SELECT n_docs FROM stats) AS BIGINT) - COUNT(*))
                   + 0.5) / (COUNT(*) + 0.5))) AS BIGINT) AS idf
        FROM toks GROUP BY token),
sc AS (
  SELECT t.doc_id,
         CAST(SUM(CAST(floor(
           (d.idf * (CAST(t.tf AS DOUBLE) * ({_textops.BM25_K1} + 1.0)))
           / (CAST(t.tf AS DOUBLE) + {_textops.BM25_K1}
              * ((1.0 - {_textops.BM25_B})
                 + {_textops.BM25_B}
                   * (CAST(l.dl AS DOUBLE)
                      / (SELECT avgdl FROM stats)))))
           AS BIGINT)) AS BIGINT) AS score_milli
  FROM toks t JOIN dfs d ON d.token = t.token
              JOIN dls l ON l.doc_id = t.doc_id
  GROUP BY t.doc_id)
SELECT doc_id, score_milli,
       ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id) AS rk
FROM sc ORDER BY score_milli DESC, doc_id
LIMIT {_textops.SEARCH_TOPK}""",
        # Sliding-window COUNT DISTINCT: each event in exactly two
        # 1-hour windows 30 minutes apart.
        "sliding_distinct": f"""
WITH w AS (
  SELECT DISTINCT user_id,
    (epoch_us(ts) // {_rel_mod.SLIDE_HOP_US}) * {_rel_mod.SLIDE_HOP_US}
      - s.off AS ws_us
  FROM events
  CROSS JOIN (SELECT unnest([0, {_rel_mod.SLIDE_HOP_US}]) AS off) s)
SELECT make_timestamp(ws_us) AS window_start,
       COUNT(*) AS n_users
FROM w GROUP BY 1""",
        # Median + MAD per language: ceil(0.5*n)-th smallest on both
        # the length and the deviation distribution (the
        # quantiles_by_lang convention).
        "mad_by_lang": """
WITH n AS (SELECT lang, n_chars AS L FROM documents),
c AS (SELECT lang, COUNT(*) AS total FROM n GROUP BY lang),
r AS (SELECT lang, L,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY L) AS rnk
      FROM n),
med AS (
  SELECT r.lang,
    MAX(CASE WHEN rnk = CAST(ceil(0.5 * total) AS BIGINT) THEN L END)
      AS med
  FROM r JOIN c USING (lang) GROUP BY r.lang),
d AS (SELECT n.lang, ABS(n.L - med.med) AS D
      FROM n JOIN med ON n.lang = med.lang),
rd AS (SELECT lang, D,
              ROW_NUMBER() OVER (PARTITION BY lang ORDER BY D) AS rnk
       FROM d)
SELECT rd.lang, MAX(med.med) AS med,
  MAX(CASE WHEN rnk = CAST(ceil(0.5 * total) AS BIGINT) THEN D END)
    AS mad
FROM rd JOIN c USING (lang) JOIN med ON rd.lang = med.lang
GROUP BY rd.lang""",
        # Triangle counts: each triangle enumerated once (u<v<w with
        # all three edges), every corner counted.
        "triangles": """
WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
            FROM lineitem),
e AS (SELECT DISTINCT a.s AS u, b.s AS v
      FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
nodes AS (SELECT a AS s FROM tri
          UNION ALL SELECT b FROM tri
          UNION ALL SELECT c FROM tri)
SELECT s AS s_suppkey, COUNT(*) AS n_triangles
FROM nodes GROUP BY s""",
        # RFM quartiles: NTILE over (metric, custkey) order — the
        # unique tiebreak makes every bucket assignment deterministic.
        "rfm_scores": f"""
WITH cust AS (
  SELECT o_custkey,
         MAX(epoch_us(o_orderdate)) AS r_us,
         COUNT(*) AS f,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS m_cents
  FROM orders GROUP BY o_custkey)
SELECT o_custkey,
  NTILE({_rel_mod.RFM_TILES}) OVER (ORDER BY r_us, o_custkey)
    AS r_score,
  NTILE({_rel_mod.RFM_TILES}) OVER (ORDER BY f, o_custkey) AS f_score,
  NTILE({_rel_mod.RFM_TILES}) OVER (ORDER BY m_cents, o_custkey)
    AS m_score
FROM cust""",
        # URL canonicalization dedup: the three crawl-variant forms
        # collapse to one canonical URL per doc (RE2 + lower, same
        # kernels as the engine).
        "url_dedup": _W + """,
var AS (
  SELECT doc_id, CASE k
    WHEN 0 THEN url || '?utm_source=' || CAST(doc_id % 7 AS VARCHAR)
    WHEN 1 THEN url || '#section-' || CAST(doc_id % 5 AS VARCHAR)
    ELSE upper(url) || '/' END AS u
  FROM pages CROSS JOIN range(3) t(k))
SELECT lower(regexp_replace(regexp_replace(u, '[?#].*$', ''),
             '/$', '')) AS url,
       MIN(doc_id) AS doc_id,
       COUNT(*) AS n_variants
FROM var GROUP BY 1""",
        # Daily growth: actives = distinct (user, day); news = count
        # of per-user MIN(day); COALESCE(0) for no-new-user days.
        "user_growth": """
WITH e AS (SELECT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
           FROM events),
ev AS (SELECT d, COUNT(*) AS n_events,
              COUNT(DISTINCT user_id) AS n_active_users
       FROM e GROUP BY d),
fst AS (SELECT user_id, MIN(d) AS fd FROM e GROUP BY user_id),
nw AS (SELECT fd AS d, COUNT(*) AS n_new_users FROM fst GROUP BY fd)
SELECT ev.d, ev.n_events, ev.n_active_users,
       COALESCE(nw.n_new_users, 0) AS n_new_users
FROM ev LEFT JOIN nw USING (d)""",
        # LAG window: gap multiset is tie-order invariant, so the
        # aggregates are deterministic; single-event users get NULL
        # max/min (empty window).
        "order_gap": """
WITH g AS (
  SELECT user_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT user_id, COUNT(*) AS n_events, COUNT(gap) AS n_gaps,
  CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap_us,
  COALESCE(MAX(gap), -1) AS max_gap_us,
  COALESCE(MIN(gap), -1) AS min_gap_us,
  CASE WHEN COUNT(gap) > 0
       THEN CAST(COALESCE(SUM(gap), 0) AS DOUBLE)
            / CAST(COUNT(gap) AS DOUBLE)
       ELSE 0.0 END AS avg_gap_us
FROM g GROUP BY user_id""",
        # Market-basket self-join on the DISTINCT (user, day, type)
        # set only; unordered pairs via the a < b half-matrix.
        "cooccur_types": """
WITH dt AS (SELECT DISTINCT user_id,
              CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
              event_type FROM events)
SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS n
FROM dt a JOIN dt b ON a.user_id = b.user_id AND a.d = b.d
                   AND a.event_type < b.event_type
GROUP BY 1, 2""",
        # Dense vocabulary ids = 0-based rank in (binary-collation)
        # token order over the distinct token set.
        "vocab_ids": """
SELECT token,
  CAST(ROW_NUMBER() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id
FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS token
      FROM documents)""",
        # Source-pair vocabulary Jaccard; union term from per-source
        # vocab sizes (same inter / (va + vb - inter) expression tree
        # as textops.source_jaccard).
        "source_jaccard": """
WITH ts AS (SELECT DISTINCT source,
              unnest(string_split(text, ' ')) AS token FROM documents),
v AS (SELECT source, COUNT(*) AS nv FROM ts GROUP BY source),
i AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS n_inter
      FROM ts a JOIN ts b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2)
SELECT sa, sb, n_inter,
  CAST(va.nv + vb.nv - n_inter AS BIGINT) AS n_union,
  CAST(n_inter AS DOUBLE)
    / CAST(va.nv + vb.nv - n_inter AS DOUBLE) AS jaccard
FROM i JOIN v va ON va.source = i.sa JOIN v vb ON vb.source = i.sb""",
        # Count-min sketch over the FULL token stream (same md5->M31
        # token hash as the minhash chain; a < 2^31 so a*h stays
        # BIGINT-safe), read out at the exact top-20 tokens.
        "cms_heavy": f"""
WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
tok AS (SELECT unnest(ts) AS t FROM toks),
th AS (SELECT t, ('0x' || substr(md5(t),1,15))::BIGINT
                 % {_dedup.MERSENNE} AS h FROM tok),
rw AS (SELECT CAST(col0 AS BIGINT) AS r, CAST(col1 AS BIGINT) AS a,
              CAST(col2 AS BIGINT) AS b
       FROM (VALUES {", ".join(f"({r}, {a}, {b})" for r, (a, b) in
                               enumerate(zip(_textops.CMS_A,
                                             _textops.CMS_B)))})
            v(col0, col1, col2)),
cells AS (SELECT rw.r,
                 (rw.a * th.h + rw.b) % {_dedup.MERSENNE}
                     % {_textops.CMS_W} AS cell,
                 COUNT(*) AS cnt
          FROM th CROSS JOIN rw GROUP BY 1, 2),
exact AS (SELECT t AS token, COUNT(*) AS n_exact FROM tok
          GROUP BY t ORDER BY n_exact DESC, t ASC LIMIT 20),
hh AS (SELECT token, n_exact,
              ('0x' || substr(md5(token),1,15))::BIGINT
                  % {_dedup.MERSENNE} AS h
       FROM exact)
SELECT hh.token, hh.n_exact, CAST(MIN(c.cnt) AS BIGINT) AS n_cms
FROM hh CROSS JOIN rw
JOIN cells c ON c.r = rw.r
   AND c.cell = (rw.a * hh.h + rw.b) % {_dedup.MERSENNE}
                % {_textops.CMS_W}
GROUP BY hh.token, hh.n_exact""",
        # Priority sampling: u and pri are each ONE correctly-rounded
        # double division, same order as relational.weighted_sample.
        "weighted_sample": f"""
WITH pr AS (
  SELECT doc_id, n_chars,
         CAST(((doc_id % {_rel_mod.PRI_HMOD}) * {_rel_mod.PRI_HMULT}
               + {_rel_mod.PRI_HADD}) % {_rel_mod.PRI_HMOD} + 1
              AS DOUBLE) / {_rel_mod.PRI_HMOD} AS u
  FROM documents),
p2 AS (SELECT doc_id, n_chars,
              CAST(n_chars AS DOUBLE) / u AS pri FROM pr)
SELECT doc_id, n_chars, pri FROM p2
ORDER BY pri DESC, doc_id ASC LIMIT 50""",
        # Polynomial rolling hash over the utf-8 bytes; the corpus is
        # ASCII so ord(substr(..)) == byte value.  Powers of FP_BASE mod
        # FP_MOD come from a recursive CTE bounded by the longest text.
        "fingerprint": f"""
WITH RECURSIVE pows(i, p) AS (
  SELECT 0, CAST(1 AS BIGINT)
  UNION ALL
  SELECT i + 1, (p * {_textops.FP_BASE}) % {_textops.FP_MOD} FROM pows
  WHERE i < (SELECT max(strlen(text)) FROM documents)
),
chars AS (
  SELECT doc_id, unnest(generate_series(1, strlen(text))) AS i, text
  FROM documents
)
,
fps AS (
  SELECT c.doc_id,
         CAST(SUM(ord(substr(c.text, c.i, 1)) * p.p % {_textops.FP_MOD})
              % {_textops.FP_MOD} AS BIGINT) AS fingerprint
  FROM chars c JOIN pows p ON p.i = c.i - 1
  GROUP BY c.doc_id)
SELECT d.doc_id, COALESCE(f.fingerprint, 0) AS fingerprint
FROM documents d LEFT JOIN fps f USING (doc_id)""",
        "ann_topk": f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings
           ORDER BY vec_id LIMIT {_ann.N_QUERIES_DEFAULT}),
sims AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                list_cosine_similarity(q.embedding, e.embedding) AS sim
         FROM q, embeddings e WHERE e.vec_id != q.query_id),
r AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS "rank"
      FROM sims)
SELECT query_id, neighbor_id, "rank" FROM r
WHERE "rank" <= {_ann.TOPK_DEFAULT}""",
        # Scalar-quantized integer top-k: same double arithmetic for
        # the quantizer ((x-mn)/((mx-mn)/255.0), floor, clip) and pure
        # BIGINT scoring (see ann.sq_quantize).
        "sq_topk": f"""
WITH flat AS (
  SELECT vec_id, g.i AS d, CAST(embedding[g.i] AS DOUBLE) AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
mm AS (SELECT MAX(abs(x)) AS a FROM flat),
qcode AS (SELECT vec_id, f.d,
         CASE WHEN mm.a = 0 THEN 0
              ELSE LEAST(127, GREATEST(-127,
                CAST(floor(f.x / (mm.a / 127.0) + 0.5) AS BIGINT)))
         END AS qv
       FROM flat f, mm),
heads AS (SELECT vec_id FROM embeddings
          ORDER BY vec_id LIMIT {_ann.N_QUERIES_DEFAULT}),
dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                CAST(SUM(a.qv * b.qv) AS BIGINT) AS score
         FROM qcode a JOIN qcode b USING (d)
         WHERE a.vec_id IN (SELECT vec_id FROM heads)
           AND b.vec_id != a.vec_id
         GROUP BY 1, 2)
SELECT query_id, neighbor_id, "rank", score FROM (
  SELECT query_id, neighbor_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS "rank"
  FROM dots)
WHERE "rank" <= {_ann.TOPK_DEFAULT}""",
        # SemDeDup: kmeans assignment (shared CTE) + same-cluster
        # pair prune on the integer predicate 1e6*dot^2 >= t^2*na*nb
        # over floor(x*128) components — no float division either side
        "semdedup_keep": _kmeans_d2_cte() + f""",
asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rn
          FROM d2) WHERE rn = 1),
sq AS (SELECT vec_id, g.i AS dim,
              CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                         * {_ann.SEM_SCALE}.0) AS BIGINT) AS qs
       FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)),
nn AS (SELECT vec_id, CAST(SUM(qs * qs) AS BIGINT) AS n2
       FROM sq GROUP BY 1),
cp AS (SELECT ax.vec_id AS va, ay.vec_id AS vb
       FROM asg ax JOIN asg ay
         ON ay.cid = ax.cid AND ax.vec_id < ay.vec_id),
pr AS (SELECT cp.va, cp.vb, CAST(SUM(x.qs * y.qs) AS BIGINT) AS dot
       FROM cp JOIN sq x ON x.vec_id = cp.va
               JOIN sq y ON y.vec_id = cp.vb AND y.dim = x.dim
       GROUP BY 1, 2),
drops AS (SELECT DISTINCT p.vb AS vec_id
          FROM pr p JOIN nn na ON na.vec_id = p.va
                    JOIN nn nb ON nb.vec_id = p.vb
          WHERE p.dot > 0
            AND 1000000 * p.dot * p.dot
                >= {_ann.SEM_T_MILLI ** 2} * na.n2 * nb.n2)
SELECT a.vec_id, CAST(a.cid AS BIGINT) AS cluster,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM asg a LEFT JOIN drops d USING (vec_id)""",
        # Integer-exact Lloyd's k-means (2 iterations, fixed-point
        # 2^20 quantization): every distance is an exact int; the
        # centroid mean is the same IEEE double floor-division both
        # sides.  SUM(BIGINT) -> HUGEINT, hence the outer casts.
        "kmeans": _kmeans_d2_cte() + """
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, CAST(dist AS BIGINT) AS dist
FROM (SELECT vec_id, cid, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist, cid) AS rn
      FROM d2) WHERE rn = 1""",
        # DuckDB SUM(BIGINT) yields HUGEINT (-> float64 in the compare), so
        # every outer SUM below is CAST back to BIGINT to match the engine.
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_base_cents,
       CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS sum_disc_pct,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "top_customers": """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS total_cents,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT p.o_custkey, c.c_name, c.c_mktsegment, p.total_cents, p.n_orders
FROM per p JOIN customer c ON p.o_custkey = c.c_custkey
ORDER BY p.total_cents DESC, p.o_custkey LIMIT 10""",
        "bucketed_join": """
SELECT o.o_orderstatus, l.l_returnflag,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus, l.l_returnflag""",
        "top_orders_per_customer": """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                    o_orderkey) AS rnk
  FROM orders)
SELECT o_custkey, o_orderkey, cents, rnk FROM r WHERE rnk <= 3""",
        "events_hourly": """
SELECT user_id, event_type,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
         AS value_milli,
       COUNT(*) AS n_events
FROM events GROUP BY user_id, event_type, date_trunc('hour', ts)""",
        # Rollup: three grouping levels in one result; sentinels 'ALL'/-1
        # mirror the engine's non-nullable group keys.  Hour key =
        # epoch-microseconds // 3600e6 (integer floor, both sides).
        "events_rollup": """
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT)
             AS hour,
         CAST(round(value * 1000) AS BIGINT) AS vm
  FROM events)
SELECT CAST(0 AS BIGINT) AS level, event_type, hour,
       CAST(SUM(vm) AS BIGINT) AS value_milli, COUNT(*) AS n_events
FROM e GROUP BY event_type, hour
UNION ALL
SELECT 1, event_type, -1, CAST(SUM(vm) AS BIGINT), COUNT(*)
FROM e GROUP BY event_type
UNION ALL
SELECT 2, 'ALL', -1, CAST(SUM(vm) AS BIGINT), COUNT(*) FROM e""",
        # Global rank/percentile by (n_chars, doc_id); integer floor
        # percentile so ties and scaling are exact.
        "length_rank": """
WITH n AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
           FROM documents),
c AS (SELECT COUNT(*) AS total FROM n),
r AS (SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rnk
      FROM n)
SELECT doc_id, n_chars, rnk,
       CAST(CASE WHEN total > 1 THEN (rnk - 1) * 1000 // (total - 1)
                 ELSE 0 END AS BIGINT) AS pct_milli
FROM r, c""",
        "distinct_users": """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type""",
        "native_join": """
SELECT c.c_mktsegment,
       CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment""",
        "pip_count_by_poly": _WP + """
SELECT poly_id, COUNT(*) AS n_hits FROM pip GROUP BY poly_id""",
        # Strict-order funnel: stage k needs an event of step k strictly
        # after the MIN completion time of stage k-1.
        "funnel": """
WITH t1 AS (SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
t2 AS (SELECT e.user_id, MIN(e.ts) AS t
       FROM events e JOIN t1 ON t1.user_id = e.user_id
       WHERE e.event_type = 'click' AND e.ts > t1.t GROUP BY e.user_id),
t3 AS (SELECT e.user_id, MIN(e.ts) AS t
       FROM events e JOIN t2 ON t2.user_id = e.user_id
       WHERE e.event_type = 'purchase' AND e.ts > t2.t
       GROUP BY e.user_id),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
       CAST(CASE WHEN t3.user_id IS NOT NULL THEN 3
                 WHEN t2.user_id IS NOT NULL THEN 2
                 WHEN t1.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage
FROM u LEFT JOIN t1 ON t1.user_id = u.user_id
       LEFT JOIN t2 ON t2.user_id = u.user_id
       LEFT JOIN t3 ON t3.user_id = u.user_id""",
        "multi_source": """
WITH u AS (SELECT text, lang FROM documents
           UNION ALL SELECT text, lang FROM documents)
SELECT lang, CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       COUNT(*) AS n_docs
FROM u GROUP BY lang""",
        "stac_union": _W + """,
u AS (SELECT url, text FROM pages UNION ALL SELECT url, text FROM pages)
SELECT url, CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       COUNT(*) AS n_copies
FROM u GROUP BY url""",
        "hash_sample": """
SELECT doc_id, lang FROM documents
WHERE (doc_id % 100 * 2654435761) % 100 < 10""",
        "union_counts": """
SELECT src, COUNT(*) AS n FROM (
  SELECT r_name AS name, 'region' AS src FROM region
  UNION ALL
  SELECT n_name AS name, 'nation' AS src FROM nation
) GROUP BY src""",
        "events_sliding": """
SELECT event_type, window_start, COUNT(*) AS n_events FROM (
  SELECT event_type,
         time_bucket(INTERVAL '30 minutes', ts) AS window_start
  FROM events
  UNION ALL
  SELECT event_type,
         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
  FROM events
) GROUP BY event_type, window_start""",
        "sessionize": """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events),
s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_idx
  FROM d)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM s GROUP BY user_id, session_idx""",
        # backward as-of join: latest strictly-prior purchase per user;
        # tie rule = max event_id among equal anchor timestamps (the
        # engine's merge_asof takes the last row of the (ts, event_id)-
        # sorted right frame)
        "asof_prior_anchor": """
WITH j AS (
  SELECT e.event_id, e.user_id, e.ts, e.event_type,
         p.event_id AS anchor_event_id, p.ts AS anchor_ts,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM events e LEFT JOIN events p
    ON p.user_id = e.user_id AND p.event_type = 'purchase'
       AND p.ts < e.ts)
SELECT event_id, user_id, ts, event_type,
       COALESCE(anchor_event_id, -1) AS anchor_event_id,
       COALESCE(anchor_ts, TIMESTAMP '1970-01-01') AS anchor_ts
FROM j WHERE rn = 1""",
        # interval join via cumulative-frame differencing: events of the
        # same user in (ts, ts + 60 min] per signup anchor
        "anchor_window_follow": """
SELECT a.event_id, a.user_id, a.ts,
       COUNT(f.event_id) AS n_follow,
       CAST(COALESCE(SUM(CAST(round(f.value * 1000) AS BIGINT)), 0)
            AS BIGINT) AS vm_follow
FROM events a LEFT JOIN events f
  ON f.user_id = a.user_id AND f.ts > a.ts
     AND f.ts <= a.ts + INTERVAL 60 MINUTE
WHERE a.event_type = 'signup'
GROUP BY a.event_id, a.user_id, a.ts""",
        # The media table is synthesized deterministically from doc_id, so
        # the (id, kind) projection and the frame layout (payload sizes ->
        # frame counts) are pure integer SQL; feature VALUES stay pinned by
        # golden decode tests (RNG bytes are not SQL-expressible).
        # NN thumbnail of the red channel: src pixel (py*h//4, px*w//4),
        # value = (sy*7 + sx*3 + id) % 256 (the deterministic channel of
        # the synthetic PPM) - pins the REAL decode per pixel value.
        "image_thumbs": """
WITH img AS (
  SELECT doc_id AS id, 16 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
  FROM documents WHERE doc_id % 3 = 0),
g AS (SELECT id, w, h, y.y AS py, x.x AS px
      FROM img, (VALUES (0), (1), (2), (3)) y(y),
                (VALUES (0), (1), (2), (3)) x(x))
SELECT id, CAST(py AS BIGINT) AS py, CAST(px AS BIGINT) AS px,
       CAST(((py * h // 4) * 7 + (px * w // 4) * 3 + id) % 256
            AS BIGINT) AS r
FROM g""",
        "media_features": """
SELECT doc_id AS id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind
FROM documents""",
        "media_frames": """
WITH sz AS (
  SELECT doc_id AS id,
         CASE doc_id % 3
           WHEN 0 THEN 13 + (16 + doc_id % 16) * (16 + doc_id % 8) * 3
           WHEN 1 THEN (256 + doc_id % 512) * 2
           ELSE 256 + doc_id % 512 END AS nbytes,
         CASE doc_id % 3 WHEN 1 THEN 128 ELSE 64 END AS unit
  FROM documents
)
SELECT id, CAST(unnest(generate_series(0, nbytes // unit - 1, 2))
                AS BIGINT) AS frame_idx
FROM sz WHERE nbytes // unit >= 1""",
        # IVF is approximate-but-deterministic: centroids are the first
        # nlist embeddings, assignment/probe are cosine argmax/top-nprobe
        # with index tie-breaks — all rank-only comparisons, so the SQL
        # mirror is exact (same contract as ann_topk).
        "ivf_topk": f"""
WITH c0 AS (SELECT embedding, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx
            FROM embeddings ORDER BY vec_id LIMIT {_ann.IVF_NLIST_DEFAULT}),
q AS (SELECT vec_id AS query_id, embedding FROM embeddings
      ORDER BY vec_id LIMIT {_ann.N_QUERIES_DEFAULT}),
assign AS (SELECT e.vec_id, e.embedding, c.cidx,
        ROW_NUMBER() OVER (PARTITION BY e.vec_id
          ORDER BY list_cosine_similarity(c.embedding, e.embedding) DESC,
                   c.cidx) AS rn
       FROM embeddings e CROSS JOIN c0 c),
cell AS (SELECT vec_id, embedding, cidx FROM assign WHERE rn = 1),
probe AS (SELECT q.query_id, c.cidx,
        ROW_NUMBER() OVER (PARTITION BY q.query_id
          ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                   c.cidx) AS rn
       FROM q CROSS JOIN c0 c),
sims AS (SELECT q.query_id, v.vec_id AS neighbor_id,
                list_cosine_similarity(q.embedding, v.embedding) AS sim
         FROM q JOIN probe p ON p.query_id = q.query_id
                            AND p.rn <= {_ann.IVF_NPROBE_DEFAULT}
                JOIN cell v ON v.cidx = p.cidx
         WHERE v.vec_id != q.query_id),
r AS (SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, neighbor_id) AS "rank"
      FROM sims)
SELECT query_id, neighbor_id, "rank" FROM r
WHERE "rank" <= {_ann.TOPK_DEFAULT}""",
        "minhash_pairs": "WITH " + _minhash_sql_chain() + """
SELECT doc_a, doc_b FROM cand""",
        # Exact shingle Jaccard over the candidate pairs; integer floor
        # division mirrors the engine's 1000*inter // union.
        "minhash_verified": "WITH " + _minhash_sql_chain() + """,
cnts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS i
          FROM cand p
          JOIN sh x ON x.doc_id = p.doc_a
          JOIN sh y ON y.doc_id = p.doc_b AND y.sh = x.sh
          GROUP BY p.doc_a, p.doc_b)
SELECT p.doc_a, p.doc_b,
       (1000 * COALESCE(i.i, 0))
         // (ca.n + cb.n - COALESCE(i.i, 0)) AS jaccard_milli
FROM cand p
JOIN cnts ca ON ca.doc_id = p.doc_a
JOIN cnts cb ON cb.doc_id = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b""",
        "simhash": "WITH " + _minhash_sql_chain() + _simhash_sql(),
        "simhash_pairs": "WITH " + _minhash_sql_chain()
        + _simhash_pairs_sql(),
        # Bloom probe: Kirsch-Mitzenmacher double hashing from disjoint
        # md5 halves; filter over even doc_ids, probe over odd.
        "bloom_probe": f"""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5(text), 1, 15))::BIGINT % {_dedup.BLOOM_M}
             AS h1,
         ('0x' || substr(md5(text), 17, 15))::BIGINT % {_dedup.BLOOM_M}
             AS h2
  FROM documents),
bpos AS (
  SELECT DISTINCT (h1 + i.i * h2) % {_dedup.BLOOM_M} AS p
  FROM h, (VALUES (0), (1), (2), (3)) i(i) WHERE doc_id % 2 = 0),
probe AS (
  SELECT doc_id, (h1 + i.i * h2) % {_dedup.BLOOM_M} AS p
  FROM h, (VALUES (0), (1), (2), (3)) i(i) WHERE doc_id % 2 = 1)
SELECT doc_id,
       CAST(CASE WHEN COUNT(*) FILTER (WHERE p IN (SELECT p FROM bpos))
                      = {_dedup.BLOOM_K} THEN 1 ELSE 0 END AS BIGINT)
           AS maybe_seen
FROM probe GROUP BY doc_id""",
        # HLL registers: bucket = h % 256, rho = 1 + lowest-set-bit rank
        # of h // 256 (log2 of an exact power of two is exact in double;
        # zero suffix -> 53).  Register-bounded shuffle.
        "hll_registers": f"""
WITH toks AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
r AS (SELECT h % {_dedup.HLL_BUCKETS} AS bucket,
             h // {_dedup.HLL_BUCKETS} AS rest FROM h)
SELECT bucket,
       MAX(CASE WHEN rest = 0 THEN 53
                ELSE CAST(floor(log2(CAST(rest & -rest AS DOUBLE)))
                          AS BIGINT) + 1 END) AS rho
FROM r GROUP BY bucket""",
        # Exact mirror of the full near-dup path: derandomized
        # Rademacher plane signs (LCG mix), size-scaled planes-per-band,
        # bucket-cap salting (vec_id % min(ceil(n/cap), MAX_SALTS)), and
        # the cosine>=0.4 verification.  A sign flip would need a
        # projection within float ULPs of zero — measure-zero for
        # continuous embeddings.
        "embedding_near_dup": f"""
WITH params AS (
  SELECT GREATEST({_ann.LSH_MIN_PLANES},
         CAST(ceil(log2(GREATEST(2.0, count(*) / {_ann.LSH_TARGET_BUCKET}.0)))
              AS BIGINT)) AS planes,
         (SELECT len(embedding) FROM embeddings LIMIT 1) AS dim
  FROM embeddings),
pl AS (SELECT unnest(generate_series(0, {_ann.LSH_BANDS} * planes - 1)) AS p
       FROM params),
dims AS (SELECT unnest(generate_series(1, dim)) AS d FROM params),
proj AS (SELECT e.vec_id, pl.p,
                SUM(CASE WHEN ((pl.p * {_dedup.SH_C1}
                                + (d.d - 1) * {_dedup.SH_C2})
                               % {_dedup.MERSENNE}) % 2 = 0
                         THEN CAST(e.embedding[d.d] AS DOUBLE)
                         ELSE -CAST(e.embedding[d.d] AS DOUBLE) END) AS pr
         FROM embeddings e CROSS JOIN pl CROSS JOIN dims d
         GROUP BY e.vec_id, pl.p),
buck AS (SELECT vec_id, p // planes AS band,
                SUM(CASE WHEN pr > 0
                         THEN CAST(power(2, p % planes) AS BIGINT)
                         ELSE 0 END) AS bucket
         FROM proj, params GROUP BY vec_id, p // planes, planes),
gk AS (SELECT vec_id,
              band * CAST(power(2, planes) AS BIGINT) + bucket AS gkey
       FROM buck, params),
bc AS (SELECT gkey, count(*) AS n FROM gk GROUP BY gkey),
salted AS (SELECT g.vec_id, g.gkey,
                  CASE WHEN b.n > {_ann.LSH_BUCKET_CAP}
                       THEN g.vec_id % LEAST(
                           (b.n + {_ann.LSH_BUCKET_CAP - 1})
                             // {_ann.LSH_BUCKET_CAP}, {_MAX_SALTS})
                       ELSE 0 END AS salt
           FROM gk g JOIN bc b USING (gkey)),
cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         FROM salted a JOIN salted b
           ON a.gkey = b.gkey AND a.salt = b.salt AND a.vec_id < b.vec_id)
SELECT c.vec_a, c.vec_b
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.vec_a
JOIN embeddings eb ON eb.vec_id = c.vec_b
WHERE floor(list_cosine_similarity(ea.embedding, eb.embedding) * 1000)
      >= 400""",
        # Fixed-iteration integer PageRank: CTE chain generated from
        # the same constants as graph.pagerank (all-integer arithmetic,
        # // floor division on both sides -> bit-exact)
        "pagerank": _graph.pagerank_oracle_sql(),
        # Cohort retention: integer floor epoch-days on both sides
        "retention": """
WITH e AS (SELECT user_id,
                  CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
           FROM events),
f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
ud AS (SELECT DISTINCT user_id, day FROM e)
SELECT f.cohort_day, ud.day - f.cohort_day AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM ud JOIN f USING (user_id)
GROUP BY f.cohort_day, day_offset""",
        # JSON props.k extraction: RE2 regex on both sides; DuckDB's
        # regexp_extract returns '' on a miss -> NULLIF + TRY_CAST
        "props_extract": r"""
WITH x AS (SELECT event_type,
                  TRY_CAST(NULLIF(regexp_extract(
                      props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k
           FROM events)
SELECT event_type, COUNT(*) AS n_events,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k,
       MIN(k) AS min_k, MAX(k) AS max_k
FROM x GROUP BY event_type""",
        # Grouped HLL registers: same md5 60-bit register math as the
        # global hll_registers oracle, keyed by source
        "hll_by_source": f"""
WITH toks AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
  FROM documents),
h AS (SELECT source,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
r AS (SELECT source, h % {_dedup.HLL_BUCKETS} AS bucket,
             h // {_dedup.HLL_BUCKETS} AS rest FROM h)
SELECT source, bucket,
       MAX(CASE WHEN rest = 0 THEN 53
                ELSE CAST(floor(log2(CAST(rest & -rest AS DOUBLE)))
                          AS BIGINT) + 1 END) AS rho
FROM r GROUP BY source, bucket""",
        # Per-lang discrete quantiles: ceil(q*n)-th smallest, same
        # double arithmetic as textops.quantiles_by_lang
        "quantiles_by_lang": """
WITH n AS (SELECT lang, CAST(length(text) AS BIGINT) AS L
           FROM documents),
c AS (SELECT lang, COUNT(*) AS total FROM n GROUP BY lang),
r AS (SELECT lang, L,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY L) AS rnk
      FROM n)
SELECT r.lang,
  MAX(CASE WHEN rnk = CAST(ceil(0.5 * total) AS BIGINT) THEN L END)
      AS p50,
  MAX(CASE WHEN rnk = CAST(ceil(0.9 * total) AS BIGINT) THEN L END)
      AS p90,
  MAX(CASE WHEN rnk = CAST(ceil(0.99 * total) AS BIGINT) THEN L END)
      AS p99
FROM r JOIN c USING (lang) GROUP BY r.lang""",
        # TPC-H Q10 analog: returned-line revenue cents rounded per
        # LINE (engine expression order), acctbal as exact cents,
        # deterministic top-20 via (revenue DESC, custkey).
        "q10_returned": f"""
WITH rev AS (
  SELECT l_orderkey,
    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                        + 0.5) AS BIGINT)) AS BIGINT) AS rc
  FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey),
cr AS (
  SELECT o.o_custkey, CAST(SUM(r.rc) AS BIGINT) AS revenue_cents
  FROM rev r JOIN orders o ON o.o_orderkey = r.l_orderkey
  WHERE epoch_us(o.o_orderdate) >= {_rel_mod.Q10_LO_US}
    AND epoch_us(o.o_orderdate) < {_rel_mod.Q10_HI_US}
  GROUP BY o.o_custkey)
SELECT c.c_custkey, c.c_name, cr.revenue_cents,
       CAST(round(c.c_acctbal * 100.0) AS BIGINT) AS acctbal_cents,
       n.n_name
FROM cr JOIN customer c ON c.c_custkey = cr.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY cr.revenue_cents DESC, c.c_custkey
LIMIT {_rel_mod.Q10_TOPK}""",
        # TPC-H Q14 analog: conditional promo share, integer milli
        # ratio via BIGINT truncating division (positive operands).
        "q14_promo": f"""
WITH r AS (
  SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
              + 0.5) AS BIGINT) AS rev,
         CAST(p_type = 'PROMO' AS BIGINT) AS promo
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE epoch_us(l_shipdate) >= {_rel_mod.Q14_LO_US}
    AND epoch_us(l_shipdate) < {_rel_mod.Q14_HI_US})
SELECT CAST(SUM(rev * promo) AS BIGINT) AS promo_cents,
       CAST(SUM(rev) AS BIGINT) AS total_cents,
       CAST(CAST(SUM(rev * promo) AS BIGINT) * 1000
            // CAST(SUM(rev) AS BIGINT) AS BIGINT) AS promo_milli
FROM r""",
        # TPC-H Q18 analog: HAVING on the grouped quantity sum,
        # deterministic top-100 via (totalprice DESC, orderkey).
        "q18_big_orders": f"""
WITH q AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity) AS BIGINT))
         > {_rel_mod.Q18_QTY_MIN})
SELECT q.l_orderkey AS o_orderkey, o.o_custkey, c.c_name,
       o.o_orderdate,
       CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS total_cents,
       q.sum_qty
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY total_cents DESC, o_orderkey
LIMIT {_rel_mod.Q18_TOPK}""",
        # TPC-H Q7 analog: cross-nation volume by (supp nation, cust
        # nation, order year), revenue cents rounded per LINE.
        "q7_volume": f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(o.o_orderdate) AS yr,
  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                      + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE c.c_nationkey <> s.s_nationkey
  AND epoch_us(o.o_orderdate) >= {_rel_mod.Q7_LO_US}
  AND epoch_us(o.o_orderdate) < {_rel_mod.Q7_HI_US}
GROUP BY 1, 2, 3""",
        # TPC-H Q13 analog: zero-order customers kept by the left
        # outer join (COUNT(o_orderkey) over no matches = 0).
        "q13_count_dist": """
WITH cc AS (
  SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey)
SELECT c_count, COUNT(*) AS custdist FROM cc GROUP BY c_count""",
        # TPC-H Q17 analog: integer-exact 1/5-average threshold
        # (q * 5 * cnt < tq), revenue cents rounded per LINE.
        "q17_small_qty": f"""
WITH lines AS (
  SELECT l.l_partkey,
         CAST(round(l.l_quantity) AS BIGINT) AS q,
         CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0
                    + 0.5) AS BIGINT) AS rev
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_brand = '{_rel_mod.Q17_BRAND}'),
pa AS (SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS tq,
              COUNT(*) AS cnt
       FROM lines GROUP BY l_partkey)
SELECT COALESCE(CAST(SUM(rev) AS BIGINT), 0) AS rev_cents,
       COUNT(*) AS n_lines
FROM lines JOIN pa USING (l_partkey)
WHERE q * 5 * cnt < tq""",
        # TPC-H Q22 analog: integer-exact global-average compare
        # (ac * n > s), urgent-order anti-join, grouped by nation.
        "q22_idle_rich": f"""
WITH pos AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(round(c_acctbal * 100.0) AS BIGINT) AS ac
  FROM customer WHERE c_acctbal > 0.0),
g AS (SELECT CAST(SUM(ac) AS BIGINT) AS s, COUNT(*) AS n FROM pos)
SELECT c_nationkey, CAST(SUM(ac) AS BIGINT) AS acct_cents,
       COUNT(*) AS n_cust
FROM pos, g
WHERE pos.ac * g.n > g.s
  AND pos.c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderpriority = '{_rel_mod.Q22_PRIORITY}')
GROUP BY c_nationkey""",
        # Debounce: keep-if-gap-from-last-KEPT — sequential state, so
        # the mirror is a recursive CTE: each kept row joins to the
        # FIRST later row (per (ts, event_id) rank) whose ts gap is
        # strictly over the window.
        "debounce": f"""
WITH RECURSIVE ranked AS (
  SELECT user_id, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
keep(user_id, event_id, ts, rn) AS (
  SELECT user_id, event_id, ts, rn FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.user_id, r.event_id, r.ts, r.rn
  FROM keep k JOIN ranked r ON r.user_id = k.user_id
    AND r.rn > k.rn
    AND epoch_us(r.ts) - epoch_us(k.ts) > {_rel_mod.DEBOUNCE_US}
  WHERE NOT EXISTS (
    SELECT 1 FROM ranked m
    WHERE m.user_id = k.user_id AND m.rn > k.rn AND m.rn < r.rn
      AND epoch_us(m.ts) - epoch_us(k.ts) > {_rel_mod.DEBOUNCE_US}))
SELECT event_id, user_id, ts FROM keep""",
        # TPC-H Q15 analog: per-supplier windowed revenue equal to the
        # global max (all ties), revenue cents rounded per LINE.
        "q15_top_supplier": f"""
WITH rev AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                        + 0.5) AS BIGINT)) AS BIGINT) AS rc
  FROM lineitem
  WHERE epoch_us(l_shipdate) >= {_rel_mod.Q15_LO_US}
    AND epoch_us(l_shipdate) < {_rel_mod.Q15_HI_US}
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.rc AS revenue_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.rc = (SELECT MAX(rc) FROM rev)""",
        # TPC-H Q19 analog: OR-of-ANDs arms generated from Q19_ARMS,
        # revenue cents rounded per LINE; COALESCE for the empty match.
        "q19_disjunctive": f"""
SELECT COALESCE(CAST(SUM(CAST(floor(l.l_extendedprice
         * (1.0 - l.l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT),
         0) AS rev_cents,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {q19_arms}""",
        # Per-source KL numerator: floor(1000*ln(...)) per (source,
        # token) VALUE before the tf-weighted integer sum, same libm
        # ln / expression order as the engine kernel.
        "kl_by_source": """
WITH flat AS (
  SELECT source, unnest(string_split(text, ' ')) AS token
  FROM documents),
cst AS (SELECT source, token, COUNT(*) AS c_st FROM flat GROUP BY 1, 2),
ct AS (SELECT token, CAST(SUM(c_st) AS BIGINT) AS c_t FROM cst
       GROUP BY token),
ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM cst
       GROUP BY source),
tot AS (SELECT CAST(SUM(c_st) AS BIGINT) AS n FROM cst)
SELECT cst.source,
  CAST(SUM(cst.c_st * CAST(floor(1000.0 * ln(
      (CAST(cst.c_st AS DOUBLE) * CAST(tot.n AS DOUBLE))
      / (CAST(ct.c_t AS DOUBLE) * CAST(ns.n_s AS DOUBLE))))
    AS BIGINT)) AS BIGINT) AS kl_numer_milli,
  CAST(SUM(cst.c_st) AS BIGINT) AS n_tokens
FROM cst
JOIN ct USING (token)
JOIN ns ON ns.source = cst.source, tot
GROUP BY cst.source""",
        # JSONL round-trip: the engine reads a JSONL conversion of the
        # parquet table; any loss in the round-trip hash-mismatches.
        "jsonl_docs": """
SELECT doc_id, text, lang, source, n_chars FROM documents""",
        # dHash from the synthetic pixel arithmetic (red channel
        # r(y, x) = (y*7 + x*3 + id) % 256, NN floor sampling) — the
        # engine computes the same hash from the REAL decoded PPM
        # bytes, so the compare pins decode + sample + pack.
        "image_dhash": """
WITH img AS (
  SELECT doc_id AS id, 16 + doc_id % 16 AS w, 16 + doc_id % 8 AS h
  FROM documents WHERE doc_id % 3 = 0),
g AS (SELECT id, w, h, y.n AS y, x.n AS x
      FROM img,
           (SELECT unnest(generate_series(0, 7)) AS n) y,
           (SELECT unnest(generate_series(0, 7)) AS n) x),
bits AS (SELECT id, y, x,
  CASE WHEN ((y * h // 8) * 7 + (x * w // 9) * 3 + id) % 256
         < ((y * h // 8) * 7 + ((x + 1) * w // 9) * 3 + id) % 256
       THEN 1 ELSE 0 END AS b
  FROM g)
SELECT id,
  CAST(SUM(CASE WHEN y * 8 + x < 32
                THEN b * (CAST(1 AS BIGINT) << (y * 8 + x))
                ELSE 0 END) AS BIGINT) AS dhash_lo,
  CAST(SUM(CASE WHEN y * 8 + x >= 32
                THEN b * (CAST(1 AS BIGINT) << (y * 8 + x - 32))
                ELSE 0 END) AS BIGINT) AS dhash_hi
FROM bits GROUP BY id""",
        # Per-user entropy numerator: floor(-1000*ln(c/n)) per (user,
        # type) VALUE before the count-weighted integer sum (the
        # kl_by_source convention; same libm ln on both sides).
        "user_entropy": """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS c
           FROM events GROUP BY 1, 2),
n AS (SELECT user_id, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1)
SELECT c.user_id, MAX(n.n) AS n_events,
  CAST(SUM(c.c * CAST(floor(-1000.0 * ln(
      CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))) AS BIGINT))
    AS BIGINT) AS entropy_numer_milli
FROM c JOIN n USING (user_id) GROUP BY c.user_id""",
        # TPC-H Q2 analog: tie-complete per-part min over the distinct
        # supply relation, acctbal as exact cents.
        "q2_min_cost": """
WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
c AS (SELECT s.l_partkey, s.l_suppkey,
             CAST(round(su.s_acctbal * 100.0) AS BIGINT)
               AS acctbal_cents
      FROM supply s JOIN supplier su ON su.s_suppkey = s.l_suppkey),
m AS (SELECT l_partkey, MIN(acctbal_cents) AS mc FROM c GROUP BY 1)
SELECT c.l_partkey, c.l_suppkey, c.acctbal_cents
FROM c JOIN m ON m.l_partkey = c.l_partkey
             AND c.acctbal_cents = m.mc""",
        # Component-wise centroid sums: DuckDB zips parallel unnests;
        # floor(1000 * v) per element before the sum (float32 -> double
        # widening identical on both sides).
        "centroid_by_label": """
WITH u AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(range(len(embedding))) AS dim_idx,
         unnest(embedding) AS v
  FROM embeddings)
SELECT label, CAST(dim_idx AS BIGINT) AS dim_idx,
       CAST(SUM(CAST(floor(1000.0 * CAST(v AS DOUBLE)) AS BIGINT))
            AS BIGINT) AS sum_milli,
       COUNT(*) AS n
FROM u GROUP BY label, dim_idx""",
        # Composite prep chain: exact-dedup winners (min doc_id per
        # md5), ceil(0.5*n)-th-smallest length floor over the KEPT
        # set, then the chunk_docs arithmetic over the survivors.
        "llm_prep": """
WITH kept AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
d AS (SELECT doc_id, text FROM documents
      WHERE doc_id IN (SELECT doc_id FROM kept)),
n AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM d),
r AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) AS rn
      FROM n),
c AS (SELECT COUNT(*) AS total FROM n),
thr AS (SELECT r.n_chars AS t FROM r, c
        WHERE r.rn = CAST(ceil(0.5 * total) AS BIGINT)),
f AS (SELECT d.doc_id, d.text FROM d JOIN n USING (doc_id), thr
      WHERE n.n_chars >= thr.t),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM f),
chunks AS (
  SELECT doc_id, s.s // 24 AS chunk_id,
         list_slice(t, s.s + 1, s.s + 32) AS ct
  FROM toks, unnest(generate_series(0, len(t) - 1, 24)) AS s(s))
SELECT doc_id, chunk_id, len(ct) AS n_chunk_tokens,
       array_to_string(ct, ' ') AS chunk_text
FROM chunks""",
        # TPC-H Q4 analog: EXISTS with the cross-table late predicate.
        "q4_late_orders": f"""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate)
                                 + {_rel_mod.Q4_LATE_US})
GROUP BY o_orderpriority""",
        # TPC-H Q6 analog: single-row forecast scan, fixed-point cents.
        "q6_forecast": f"""
SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lines
FROM lineitem
WHERE epoch_us(l_shipdate) >= {_rel_mod.Q6_LO_US}
  AND epoch_us(l_shipdate) < {_rel_mod.Q6_HI_US}
  AND l_discount BETWEEN {_rel_mod.Q6_DISC_LO} AND {_rel_mod.Q6_DISC_HI}
  AND l_quantity < {_rel_mod.Q6_QTY_MAX}""",
        # TPC-H Q12 analog: conditional priority counts per line status
        # for late 1997 shipments.
        "q12_late_priority": f"""
SELECT l.l_linestatus,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE epoch_us(l.l_shipdate) >= {_rel_mod.Q12_LO_US}
  AND epoch_us(l.l_shipdate) < {_rel_mod.Q12_HI_US}
  AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate)
                               + {_rel_mod.Q12_LATE_US}
GROUP BY l.l_linestatus""",
        # TPC-H Q8 analog: national market share, one float division
        # per output row over integer-exact cent sums.
        "q8_share": f"""
WITH base AS (
  SELECT year(o.o_orderdate) AS yr,
         CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0
                    + 0.5) AS BIGINT) AS rev,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
       AND p.p_type = '{_rel_mod.Q8_TYPE}'
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
       AND r.r_name = '{_rel_mod.Q8_REGION}'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE epoch_us(o.o_orderdate) >= {_rel_mod.Q8_LO_US}
    AND epoch_us(o.o_orderdate) < {_rel_mod.Q8_HI_US})
SELECT yr,
  CAST(SUM(CASE WHEN supp_nation = '{_rel_mod.Q8_NATION}'
                THEN rev ELSE 0 END) AS BIGINT) AS focus_cents,
  CAST(SUM(rev) AS BIGINT) AS total_cents,
  CAST(SUM(CASE WHEN supp_nation = '{_rel_mod.Q8_NATION}'
                THEN rev ELSE 0 END) AS DOUBLE)
    / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM base GROUP BY yr""",
        # TPC-H Q9 analog: fifth-cent integer profit (rev*5 -
        # qty*retail_cents*2), supplier nation x ship year.
        "q9_profit": f"""
SELECT sn.n_name, year(l.l_shipdate) AS yr,
  CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0
                      + 0.5) AS BIGINT) * 5
           - CAST(l.l_quantity AS BIGINT)
             * CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT)
             * 2) AS BIGINT) AS profit_fcents,
  COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
     AND p.p_name LIKE '%{_rel_mod.Q9_NEEDLE}%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY 1, 2""",
        # TPC-H Q21 analog: sole late supplier on finished
        # multi-supplier orders.
        "q21_waiting": f"""
WITH lo AS (
  SELECT l.l_orderkey, l.l_suppkey,
    MAX(CASE WHEN epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate)
                                           + {_rel_mod.Q21_LATE_US}
             THEN 1 ELSE 0 END) AS late
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
       AND o.o_orderstatus = 'F'
  GROUP BY 1, 2),
per_o AS (
  SELECT l_orderkey, COUNT(*) AS n_supp,
         CAST(SUM(late) AS BIGINT) AS n_late,
         MAX(l_suppkey * late) AS late_supp
  FROM lo GROUP BY 1)
SELECT s.s_name, COUNT(*) AS numwait
FROM per_o
JOIN supplier s ON s.s_suppkey = per_o.late_supp
WHERE per_o.n_supp > 1 AND per_o.n_late = 1
GROUP BY 1""",
        # TPC-H Q16 analog: distinct suppliers per (brand, type, size)
        # with NOT-IN supplier and brand exclusions.
        "q16_supplier_cnt": f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{_rel_mod.Q16_EXCL_BRAND}'
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3""",
        # Per-document lexical diversity, integer-permille TTR.
        "ttr_stats": """
SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
    AS n_distinct,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000
    // CAST(len(string_split(text, ' ')) AS BIGINT) AS ttr_permille
FROM documents""",
        # TPC-H Q11 analog: value share above a fixed permille of one
        # nation's total, integer-exact threshold.
        "q11_important_parts": f"""
WITH v AS (
  SELECT l.l_partkey AS p_partkey,
    CAST(SUM(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                        * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
      AS value_cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
       AND n.n_name = '{_rel_mod.Q11_NATION}'
  GROUP BY 1),
tot AS (SELECT SUM(value_cents) AS t FROM v)
SELECT v.p_partkey, v.value_cents
FROM v, tot
WHERE v.value_cents * {_rel_mod.Q11_THRESH_DEN}
      > tot.t * {_rel_mod.Q11_THRESH_NUM}""",
        # TPC-H Q20 analog: suppliers over 1/5 of a part's windowed
        # quantity, integer-exact share test.
        "q20_excess_share": f"""
WITH pairs AS (
  SELECT l.l_partkey, l.l_suppkey,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
       AND p.p_name LIKE '%{_rel_mod.Q20_NEEDLE}%'
  WHERE epoch_us(l.l_shipdate) >= {_rel_mod.Q20_LO_US}
    AND epoch_us(l.l_shipdate) < {_rel_mod.Q20_HI_US}
  GROUP BY 1, 2),
tot AS (
  SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS tq
  FROM pairs GROUP BY 1)
SELECT s.s_name, COUNT(*) AS n_parts
FROM pairs
JOIN tot USING (l_partkey)
JOIN supplier s ON s.s_suppkey = pairs.l_suppkey
WHERE pairs.q * {_rel_mod.Q20_SHARE_MUL} > tot.tq
GROUP BY 1""",
        # Interval union (merged 30-min activity islands): running-max
        # island detection mirrors the kernel's segmented cummax.
        "interval_union": f"""
WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {_an_mod.IU_WINDOW_US} AS e
            FROM events),
w AS (SELECT user_id, s, e,
        MAX(e) OVER (PARTITION BY user_id ORDER BY s
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      FROM iv),
isl AS (SELECT user_id, s, e,
        SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
          OVER (PARTITION BY user_id ORDER BY s
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM w),
g AS (SELECT user_id, island, MAX(e) - MIN(s) AS len
      FROM isl GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(len) AS BIGINT) AS covered_us
FROM g GROUP BY 1""",
        # Event-type trigrams per user order (LEAD x2 window mirror).
        "trigram_paths": """
WITH s AS (SELECT user_id, event_type AS t1,
    LEAD(event_type, 1) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
    LEAD(event_type, 2) OVER
      (PARTITION BY user_id ORDER BY ts, event_id) AS t3
  FROM events)
SELECT t1, t2, t3, COUNT(*) AS cnt FROM s
WHERE t3 IS NOT NULL GROUP BY 1, 2, 3""",
        # NTILE(4) per language over the deterministic
        # (n_chars, doc_id) order.
        "ntile_buckets": """
WITH t AS (SELECT lang, n_chars,
    NTILE(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS tile
  FROM documents)
SELECT lang, CAST(tile AS BIGINT) AS tile, COUNT(*) AS cnt,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM t GROUP BY 1, 2""",
        # CUBE(lang, source) with NULL markers for rolled dimensions.
        # '(all)' sentinel for rolled-up dims (values are non-null and
        # never '(all)'): NULL markers hash-diverge across duckdb
        # versions driver-side
        "cube_counts": """
SELECT COALESCE(lang, '(all)') AS lang,
       COALESCE(source, '(all)') AS source, COUNT(*) AS cnt,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM documents GROUP BY CUBE(lang, source)""",
        # Per-dimension embedding moments; DuckDB zips the parallel
        # unnests; floor(1000*v) with identical float32->double
        # widening on both sides (centroid_by_label convention).
        "dim_variance": """
WITH u AS (SELECT unnest(range(len(embedding))) AS dim,
                  unnest(embedding) AS v FROM embeddings),
q AS (SELECT CAST(dim AS BIGINT) AS dim,
             CAST(floor(1000.0 * CAST(v AS DOUBLE)) AS BIGINT) AS q
      FROM u)
SELECT dim, COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS s1,
       CAST(SUM(q * q) AS BIGINT) AS s2
FROM q GROUP BY 1""",
        # Pareto skyline maximizing n_words, minimizing n_chars (the
        # token-density frontier); NOT EXISTS dominance test.
        "skyline_docs": """
WITH p AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                  CAST(len(string_split(text, ' ')) AS BIGINT)
                    AS n_words
           FROM documents)
SELECT doc_id, n_chars, n_words FROM p a
WHERE NOT EXISTS (SELECT 1 FROM p b
  WHERE b.n_words >= a.n_words AND b.n_chars <= a.n_chars
    AND (b.n_words > a.n_words OR b.n_chars < a.n_chars))""",
        # Integer EWMA fold over per-type daily counts: the recursive
        # CTE replays the same (c*1000 + prev) // 2 sequential fold.
        "ewma_daily": """
WITH RECURSIVE d AS (SELECT event_type,
    epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, day, c,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
  FROM d),
w(event_type, day, rn, ewma_fp) AS (
  SELECT event_type, day, rn, CAST(c * 1000 AS BIGINT)
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.event_type, r.day, r.rn,
         CAST((r.c * 1000 + w.ewma_fp) // 2 AS BIGINT)
  FROM w JOIN r ON r.event_type = w.event_type AND r.rn = w.rn + 1)
SELECT event_type, day, ewma_fp FROM w""",
        # Multi-source BFS: recursive UNION (distinct) over the same
        # node encoding as the pagerank oracle; MIN(d) = first
        # discovery = the engine's frontier expansion.
        "bfs_hops": f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem),
edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
walk(node, d) AS (
  SELECT s_suppkey * 2 + 1, 0 FROM supplier
  WHERE s_suppkey <= {_an_mod.BFS_SEED_MAX_SUPPKEY}
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.d < {_an_mod.BFS_ROUNDS})
SELECT node, CAST(MIN(d) AS BIGINT) AS hops FROM walk GROUP BY node""",
        # Levenshtein <= 2 vocabulary pairs: the oracle brute-forces
        # per length-class (hash-joinable equi-conditions) with
        # DuckDB's levenshtein(); the engine's deletion-neighborhood
        # candidates + DP verify must produce the identical set.
        "typo_pairs": f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w
              FROM documents),
v AS (SELECT DISTINCT w FROM toks
      WHERE length(w) BETWEEN {_an_mod.TYPO_MIN_LEN}
                          AND {_an_mod.TYPO_MAX_LEN}
        AND octet_length(CAST(w AS BLOB)) = length(w)),
c AS (
 SELECT a.w AS w1, b.w AS w2 FROM v a JOIN v b
   ON length(a.w) = length(b.w) AND a.w < b.w
 UNION ALL
 SELECT LEAST(a.w, b.w), GREATEST(a.w, b.w) FROM v a JOIN v b
   ON length(b.w) = length(a.w) + 1
 UNION ALL
 SELECT LEAST(a.w, b.w), GREATEST(a.w, b.w) FROM v a JOIN v b
   ON length(b.w) = length(a.w) + 2)
SELECT w1, w2, CAST(levenshtein(w1, w2) AS BIGINT) AS dist
FROM c WHERE levenshtein(w1, w2) BETWEEN 1 AND {_an_mod.TYPO_MAX_DIST}""",
        # Ordered string aggregation: the roster join order IS the
        # sort order on both sides.
        "lang_concat": """
SELECT source, CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs_csv
FROM documents GROUP BY 1""",
        # Prefix-trie subtree rollup: every line joins its 7 decimal
        # ancestors (constant explode, no recursion); rev cents use
        # the shared floor(x*100 + 0.5) expression.
        "hierarchy_rollup": f"""
WITH l AS (SELECT l_partkey AS k,
    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
         AS BIGINT) AS rev
  FROM lineitem),
e AS (SELECT k // CAST(power(10, j) AS BIGINT) AS node, rev
      FROM l CROSS JOIN (SELECT unnest(generate_series(0,
        {_an_mod.HIER_LEVELS - 1})) AS j)
      WHERE j = 0 OR k // CAST(power(10, j - 1) AS BIGINT) > 0)
SELECT node, CAST(SUM(rev) AS BIGINT) AS rev_cents,
       COUNT(*) AS n_lines
FROM e GROUP BY 1""",
        # Co-visitation: distinct (day, user) self-join; COUNT(*) is
        # the shared-day count because the pair fires once per day.
        "covisit_pairs": f"""
WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                            user_id FROM events)
SELECT a.user_id AS u1, b.user_id AS u2, COUNT(*) AS days
FROM du a JOIN du b ON a.day = b.day AND a.user_id < b.user_id
GROUP BY 1, 2 HAVING COUNT(*) >= {_an_mod.COVISIT_MIN_DAYS}""",
        # ring-1 hex density smoothing: cells CTE is the exact per-cell
        # count; the 7-offset cross join mirrors knn.HEX_RING1_OFFSETS
        "cell_smooth": _WH + f""",
cells AS (SELECT hex7, COUNT(*) AS n FROM hex9 GROUP BY hex7),
offs AS (SELECT * FROM (VALUES {", ".join(f"({o})" for o in _gx_mod.HEX_RING1_OFFSETS)}) t(off))
SELECT CAST(c.hex7 + o.off AS BIGINT) AS hex7,
       CAST(SUM(c.n) AS BIGINT) AS n_smooth
FROM cells c CROSS JOIN offs o GROUP BY 1""",
        # chord metric (12742*sqrt(a)), NOT haversine's asin: numpy and
        # DuckDB asin/atan2 differ by up to 2 ulp on this box; sin/cos/
        # sqrt/radians are bit-exact (geoext.py module docstring)
        "track_legs": _WG + """,
legs AS (
  SELECT cluster, doc_id, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
  FROM geo WINDOW w AS (PARTITION BY cluster ORDER BY doc_id)
),
lt AS (
  SELECT cluster,
         sin(radians(lat - plat) / 2.0) AS sd1,
         cos(radians(plat)) AS c1, cos(radians(lat)) AS c2,
         sin(radians(lon - plon) / 2.0) AS sd2
  FROM legs WHERE plat IS NOT NULL
),
ck AS (SELECT cluster,
              12742.0 * sqrt(sd1 * sd1 + ((c1 * c2) * sd2) * sd2)
                AS chord_km
       FROM lt)
SELECT cluster, COUNT(*) AS n_legs, MAX(chord_km) AS max_leg_km,
       CAST(SUM(CAST(floor(chord_km * 1000000.0) AS BIGINT)) AS BIGINT)
         AS sum_leg_mm
FROM ck GROUP BY cluster""",
        "bbox_join": _WG + "," + _synth.sql_polygon_edges() + f""",
pbox AS (
  SELECT e.poly_id, MIN(e.ex1) AS xmin, MIN(e.ey1) AS ymin,
         MAX(e.ex1) AS xmax, MAX(e.ey1) AS ymax
  FROM edges e GROUP BY e.poly_id)
SELECT CAST(b.poly_id AS BIGINT) AS poly_id, COUNT(*) AS n_docs
FROM geo g JOIN pbox b
  ON (g.lat - {_gx_mod.BBOX_EPS_DEG!r}) <= b.ymax
 AND (g.lat + {_gx_mod.BBOX_EPS_DEG!r}) >= b.ymin
 AND (g.lon - {_gx_mod.BBOX_EPS_DEG!r}) <= b.xmax
 AND (g.lon + {_gx_mod.BBOX_EPS_DEG!r}) >= b.xmin
GROUP BY 1""",
        # centroids from exact integer terms (sum_md/1000.0)/n — bit-
        # identical constants on both engines (geoext.poly_centroid_terms)
        "nearest_poly": _WG + f""",
cent AS (SELECT CAST(poly_id AS BIGINT) AS poly_id,
                (sx / 1000.0) / n AS cx, (sy / 1000.0) / n AS cy
         FROM (VALUES {", ".join(f"({p}, {sx}, {sy}, {n})" for p, sx, sy, n in _gx_mod.poly_centroid_terms())}) v(poly_id, sx, sy, n)),
d AS (
  SELECT g.doc_id, c.poly_id,
         (g.lat - c.cy) * (g.lat - c.cy)
           + (g.lon - c.cx) * (g.lon - c.cx) AS d2,
         ROW_NUMBER() OVER (
           PARTITION BY g.doc_id
           ORDER BY (g.lat - c.cy) * (g.lat - c.cy)
                  + (g.lon - c.cx) * (g.lon - c.cx), c.poly_id) AS rn
  FROM geo g CROSS JOIN cent c)
SELECT doc_id, poly_id, d2 FROM d WHERE rn = 1""",
        "weighted_median": """
WITH b AS (SELECT l_returnflag,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
    CAST(l_quantity AS BIGINT) AS q FROM lineitem),
g AS (SELECT l_returnflag, price_c, CAST(SUM(q) AS BIGINT) AS qs
      FROM b GROUP BY 1, 2),
w AS (SELECT *,
    CAST(SUM(qs) OVER (PARTITION BY l_returnflag
                       ORDER BY price_c) AS BIGINT) AS cum,
    CAST(SUM(qs) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
  FROM g)
SELECT l_returnflag, MIN(price_c) AS wmedian_cents
FROM w WHERE 2 * cum >= tot GROUP BY 1""",
        "streaks": """
WITH d AS (SELECT DISTINCT user_id,
                           epoch_us(ts) // 86400000000 AS day FROM events),
r AS (SELECT user_id, day,
        day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
          AS grp FROM d),
s AS (SELECT user_id, grp, COUNT(*) AS len FROM r GROUP BY 1, 2)
SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS max_streak FROM s GROUP BY 1""",
        # Morton spread: the s1..s4 magic-mask ladder mirrors
        # geoext._part1by1 literal-for-literal (0x00FF00FF=16711935,
        # 0x0F0F0F0F=252645135, 0x33333333=858993459,
        # 0x55555555=1431655765)
        "zorder": _WG + f""",
q AS (SELECT
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 65536.0)
                      AS BIGINT), 0), {_gx_mod.ZQ_MAX}) AS qy,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 65536.0)
                      AS BIGINT), 0), {_gx_mod.ZQ_MAX}) AS qx
  FROM geo),
s1 AS (SELECT (qx | (qx << 8)) & 16711935 AS x,
              (qy | (qy << 8)) & 16711935 AS y FROM q),
s2 AS (SELECT (x | (x << 4)) & 252645135 AS x,
              (y | (y << 4)) & 252645135 AS y FROM s1),
s3 AS (SELECT (x | (x << 2)) & 858993459 AS x,
              (y | (y << 2)) & 858993459 AS y FROM s2),
s4 AS (SELECT (x | (x << 1)) & 1431655765 AS x,
              (y | (y << 1)) & 1431655765 AS y FROM s3)
SELECT CAST((x | (y << 1)) >> {_gx_mod.ZPREFIX_SHIFT} AS BIGINT)
         AS zprefix,
       COUNT(*) AS n_pages
FROM s4 GROUP BY 1""",
        # chord metric as track_legs; centroid constants from the same
        # exact integer terms as nearest_poly
        "dist_join": _WG + f""",
cent AS (SELECT CAST(poly_id AS BIGINT) AS poly_id,
                (sx / 1000.0) / n AS cx, (sy / 1000.0) / n AS cy
         FROM (VALUES {", ".join(f"({p}, {sx}, {sy}, {n})" for p, sx, sy, n in _gx_mod.poly_centroid_terms())}) v(poly_id, sx, sy, n))
SELECT c.poly_id, COUNT(*) AS n_docs
FROM geo g CROSS JOIN cent c
WHERE 12742.0 * sqrt(
    sin(radians(c.cy - g.lat) / 2.0) * sin(radians(c.cy - g.lat) / 2.0)
    + ((cos(radians(g.lat)) * cos(radians(c.cy)))
       * sin(radians(c.cx - g.lon) / 2.0))
      * sin(radians(c.cx - g.lon) / 2.0)) < {_gx_mod.DIST_RADIUS_KM!r}
GROUP BY 1""",
        # disk sum and self count come back from the SAME scatter
        # groupby (off=0 carries self_n), mirroring geoext.hotspots
        "hotspots": _WH + f""",
cells AS (SELECT hex7, COUNT(*) AS n FROM hex9 GROUP BY 1),
offs AS (SELECT * FROM (VALUES {", ".join(f"({o})" for o in _gx_mod.HEX_RING1_OFFSETS)}) t(off)),
sc AS (SELECT c.hex7 + o.off AS cell, c.n AS n_src,
              CASE WHEN o.off = 0 THEN c.n ELSE 0 END AS self_n
       FROM cells c CROSS JOIN offs o),
d AS (SELECT cell, SUM(n_src) AS n_disk, SUM(self_n) AS n_pages
      FROM sc GROUP BY 1),
tot AS (SELECT SUM(n) AS t, COUNT(*) AS c FROM cells)
SELECT CAST(d.cell AS BIGINT) AS hex7,
       CAST(d.n_pages AS BIGINT) AS n_pages,
       CAST(d.n_disk AS BIGINT) AS n_disk
FROM d, tot
WHERE d.n_pages >= 1
  AND d.n_disk * tot.c > {_gx_mod.HOT_FACTOR} * 7 * tot.t""",
        # recursive min-label propagation over dense-cell hex adjacency
        # (same reach/comp shape as the polygon_components oracle)
        "hex_clusters": "WITH RECURSIVE " + _synth.SQL_PAGES + ","
        + _synth.SQL_GEO + "," + _synth.sql_hex_chain() + f""",
cells AS (SELECT hex7, COUNT(*) AS n FROM hex9 GROUP BY 1),
dense AS (SELECT hex7, n FROM cells WHERE n >= {_gx_mod.HEX_MINPTS}),
adj AS (SELECT a.hex7 AS src, b.hex7 AS dst FROM dense a JOIN dense b
        ON (b.hex7 - a.hex7) IN (1, -1, 65536, -65536, 65535, -65535)),
reach AS (SELECT hex7 AS cell, hex7 AS lbl FROM dense
          UNION
          SELECT a.src AS cell, r.lbl FROM adj a
          JOIN reach r ON a.dst = r.cell),
comp AS (SELECT cell, MIN(lbl) AS root FROM reach GROUP BY 1)
SELECT CAST(c.root AS BIGINT) AS cluster,
       COUNT(*) AS n_cells, CAST(SUM(d.n) AS BIGINT) AS n_pages
FROM dense d JOIN comp c ON d.hex7 = c.cell GROUP BY 1""",
        # gaps-and-islands over dwell legs (chord < eps); rn - rd is
        # the island key (standard consecutive-rows grouping)
        "stops": _WG + f""",
legs AS (
  SELECT cluster, doc_id, lat, lon,
         lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
  FROM geo WINDOW w AS (PARTITION BY cluster ORDER BY doc_id)
),
ck AS (SELECT cluster, doc_id,
         12742.0 * sqrt(
           sin(radians(lat - plat) / 2.0) * sin(radians(lat - plat) / 2.0)
           + ((cos(radians(plat)) * cos(radians(lat)))
              * sin(radians(lon - plon) / 2.0))
             * sin(radians(lon - plon) / 2.0)) AS chord
       FROM legs WHERE plat IS NOT NULL),
lg AS (SELECT cluster, doc_id, chord < {_gx_mod.STOP_EPS_KM!r} AS dwell,
              ROW_NUMBER() OVER (PARTITION BY cluster
                                 ORDER BY doc_id) AS rn FROM ck),
dd AS (SELECT cluster, rn,
              ROW_NUMBER() OVER (PARTITION BY cluster
                                 ORDER BY rn) AS rd FROM lg WHERE dwell),
isl AS (SELECT cluster, rn - rd AS grp, COUNT(*) AS len
        FROM dd GROUP BY 1, 2)
SELECT cluster, COUNT(*) AS n_stops,
       CAST(MAX(len) AS BIGINT) AS max_stop_legs
FROM isl WHERE len >= {_gx_mod.STOP_MIN_LEGS} GROUP BY 1""",
        # octant decision tree mirrors geoext.bearings: axis-major
        # split, then the two sign bits — comparisons only, no atan2
        "bearings": _WG + """,
legs AS (
  SELECT cluster, doc_id,
         lat - lag(lat) OVER w AS dlat,
         lon - lag(lon) OVER w AS dlon,
         lag(lat) OVER w AS plat
  FROM geo WINDOW w AS (PARTITION BY cluster ORDER BY doc_id)
),
oc AS (SELECT cluster,
         CASE WHEN abs(dlon) >= abs(dlat) THEN
                CASE WHEN dlon >= 0
                     THEN CASE WHEN dlat >= 0 THEN 0 ELSE 7 END
                     ELSE CASE WHEN dlat >= 0 THEN 3 ELSE 4 END END
              ELSE
                CASE WHEN dlat >= 0
                     THEN CASE WHEN dlon >= 0 THEN 1 ELSE 2 END
                     ELSE CASE WHEN dlon >= 0 THEN 6 ELSE 5 END END
         END AS octant
       FROM legs WHERE plat IS NOT NULL)
SELECT cluster, CAST(octant AS BIGINT) AS octant,
       COUNT(*) AS n_legs
FROM oc GROUP BY 1, 2""",
        # zonal majority class: per-poly modal lang, smallest-lang tie
        "zonal_mode": _WP + """,
cnt AS (SELECT poly_id, lang, COUNT(*) AS n FROM pip GROUP BY 1, 2),
rk AS (SELECT poly_id, lang, n,
              ROW_NUMBER() OVER (PARTITION BY poly_id
                                 ORDER BY n DESC, lang) AS rn FROM cnt)
SELECT CAST(poly_id AS BIGINT) AS poly_id, lang AS top_lang,
       CAST(n AS BIGINT) AS n_docs
FROM rk WHERE rn = 1""",
        # same Morton ladder as zorder; ranges are module constants
        "z_range": _WG + f""",
q AS (SELECT
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 65536.0)
                      AS BIGINT), 0), {_gx_mod.ZQ_MAX}) AS qy,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 65536.0)
                      AS BIGINT), 0), {_gx_mod.ZQ_MAX}) AS qx
  FROM geo),
s1 AS (SELECT (qx | (qx << 8)) & 16711935 AS x,
              (qy | (qy << 8)) & 16711935 AS y FROM q),
s2 AS (SELECT (x | (x << 4)) & 252645135 AS x,
              (y | (y << 4)) & 252645135 AS y FROM s1),
s3 AS (SELECT (x | (x << 2)) & 858993459 AS x,
              (y | (y << 2)) & 858993459 AS y FROM s2),
s4 AS (SELECT (x | (x << 1)) & 1431655765 AS x,
              (y | (y << 1)) & 1431655765 AS y FROM s3),
r AS (SELECT * FROM (VALUES {", ".join(f"({i}, {lo}, {hi})" for i, (lo, hi) in enumerate(_gx_mod.Z_RANGES))}) t(rid, lo, hi))
SELECT CAST(r.rid AS BIGINT) AS range_id, COUNT(*) AS n_pages
FROM s4 JOIN r ON (x | (y << 1)) >= r.lo AND (x | (y << 1)) < r.hi
GROUP BY 1""",
        "pip_anti": _WP + """
SELECT g.doc_id, g.lat, g.lon FROM hex9 g
WHERE NOT EXISTS (SELECT 1 FROM pip p WHERE p.doc_id = g.doc_id)""",
        # integer half-microdegree sums; the +0.5 floor recovers the
        # synth geocoder's exact grid integer (geoext.cluster_centroid)
        "cluster_centroid": _WG + """,
q AS (SELECT cluster,
             CAST(floor(lat * 2000000.0 + 0.5) AS BIGINT) AS ilat,
             CAST(floor(lon * 2000000.0 + 0.5) AS BIGINT) AS ilon
      FROM geo),
s AS (SELECT cluster, COUNT(*) AS n_pages,
             CAST(SUM(ilat) AS BIGINT) AS slat,
             CAST(SUM(ilon) AS BIGINT) AS slon
      FROM q GROUP BY 1)
SELECT cluster, n_pages,
       (slat / 2000000.0) / n_pages AS clat,
       (slon / 2000000.0) / n_pages AS clon
FROM s""",
        # exact integer permille: 1000 * top // total
        "cell_langmix": _WH + """,
cnt AS (SELECT hex7, lang, COUNT(*) AS n FROM hex9 GROUP BY 1, 2),
mix AS (SELECT hex7, COUNT(*) AS n_langs, MAX(n) AS top,
               SUM(n) AS total
        FROM cnt GROUP BY 1)
SELECT hex7, CAST(n_langs AS BIGINT) AS n_langs,
       CAST((1000 * top) // total AS BIGINT) AS top_permille
FROM mix""",
        "od_flows": _WH + """,
ep AS (SELECT cluster, arg_min(hex7, doc_id) AS o_hex,
              arg_max(hex7, doc_id) AS d_hex
       FROM hex9 GROUP BY 1)
SELECT o_hex, d_hex, COUNT(*) AS n_tracks FROM ep GROUP BY 1, 2""",
        # integer half-millidegree quantized variance sums; the finish
        # expression order mirrors geoext.radius_gyration term-for-term
        "radius_gyration": _WG + """,
q AS (SELECT cluster,
             CAST(floor(lat * 2000.0 + 0.5) AS BIGINT) AS qx,
             CAST(floor(lon * 2000.0 + 0.5) AS BIGINT) AS qy
      FROM geo),
s AS (SELECT cluster, COUNT(*) AS n_pages,
             CAST(SUM(qx) AS BIGINT) AS sx,
             CAST(SUM(qy) AS BIGINT) AS sy,
             CAST(SUM(qx * qx) AS BIGINT) AS sxx,
             CAST(SUM(qy * qy) AS BIGINT) AS syy
      FROM q GROUP BY 1)
SELECT cluster, n_pages,
       sqrt(greatest(
         (CAST(sxx AS DOUBLE) / n_pages
            - (CAST(sx AS DOUBLE) / n_pages) * (CAST(sx AS DOUBLE) / n_pages))
         + (CAST(syy AS DOUBLE) / n_pages
            - (CAST(sy AS DOUBLE) / n_pages) * (CAST(sy AS DOUBLE) / n_pages)),
         0.0)) / 2000.0 AS rgyr_deg
FROM s""",
        # five cross-multiplied integer predicates; bit values and
        # thresholds mirror textops.gopher_rules (GOPHER_* constants)
        "gopher_rules": """
WITH base AS (
  SELECT doc_id, length(text) AS n_chars,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tok
  FROM documents),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
    FROM documents) GROUP BY 1, 2),
agg AS (SELECT doc_id, MAX(tf) AS max_tf, COUNT(*) AS n_dist
        FROM tf GROUP BY 1),
m AS (
  SELECT b.doc_id,
         (CASE WHEN b.n_tok < 25 THEN 1 ELSE 0 END
          + CASE WHEN b.n_chars > 450 THEN 2 ELSE 0 END
          + CASE WHEN 10 * (b.n_chars - (b.n_tok - 1)) < 40 * b.n_tok
                   OR 10 * (b.n_chars - (b.n_tok - 1)) > 49 * b.n_tok
                 THEN 4 ELSE 0 END
          + CASE WHEN 100 * a.max_tf > 15 * b.n_tok THEN 8 ELSE 0 END
          + CASE WHEN 1000 * a.n_dist < 450 * b.n_tok THEN 16 ELSE 0 END
         ) AS rule_mask
  FROM base b JOIN agg a ON a.doc_id = b.doc_id)
SELECT doc_id, CAST(rule_mask AS BIGINT) AS rule_mask,
       CAST(CASE WHEN rule_mask = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM m""",
        # Gopher repetition: rendered k-gram length = token chars +
        # (k-1) spaces = length(gram); integer floor permille both
        # sides; top-gram tie breaks (tf DESC, gram) byte order
        # DSIR: same floor(1000*ln(arg)) milli-nat quantization as the
        # kl_by_source mirror; identical IEEE expression order for arg
        "dsir_weights": f"""
WITH tok AS (SELECT doc_id, lang,
                    unnest(string_split(text, ' ')) AS t
             FROM documents),
cnt AS (SELECT t,
               SUM(CASE WHEN lang = '{_textops.DSIR_TARGET_LANG}'
                        THEN 1 ELSE 0 END) AS c_tgt,
               COUNT(*) AS c_raw
        FROM tok GROUP BY t),
tot AS (SELECT CAST(SUM(c_tgt) AS BIGINT) AS n_tgt,
               CAST(SUM(c_raw) AS BIGINT) AS n_raw,
               COUNT(*) AS v
        FROM cnt),
term AS (SELECT t,
                CAST(floor(1000.0 * ln(
                  ((CAST(c_tgt AS DOUBLE) + 1.0)
                   * CAST(n_raw + v AS DOUBLE))
                  / ((CAST(c_raw AS DOUBLE) + 1.0)
                     * CAST(n_tgt + v AS DOUBLE)))) AS BIGINT) AS w
         FROM cnt, tot)
SELECT tok.doc_id, CAST(SUM(term.w) AS BIGINT) AS w_milli,
       COUNT(*) AS n_tokens
FROM tok JOIN term USING (t) GROUP BY tok.doc_id""",
        # CC of the sparsified part<->supplier graph: the mirror is a
        # recursive-CTE transitive closure (viable on the small
        # congruence-sparsified graph); the engine runs O(E)-per-round
        # star contraction — same fixpoint by definition
        "graph_components": f"""
WITH RECURSIVE e0 AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b
  FROM lineitem
  WHERE l_quantity < {_graph.CC_QTY_MAX}
    AND l_partkey % {_graph.CC_MOD} = l_suppkey % {_graph.CC_MOD}),
e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
walk(src, dst) AS (
  SELECT a, b FROM e
  UNION
  SELECT w.src, e.b FROM walk w JOIN e ON e.a = w.dst)
SELECT src AS node, CAST(LEAST(src, MIN(dst)) AS BIGINT) AS comp
FROM walk GROUP BY src""",
        "ngram_repetition": """
WITH toks AS (SELECT doc_id, length(text) AS n_chars,
                     string_split(text, ' ') AS t FROM documents),
p2 AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
       FROM (SELECT doc_id, t,
                    unnest(generate_series(1, len(t) - 1)) AS i
             FROM toks)),
c2 AS (SELECT doc_id, gram, COUNT(*) AS tf FROM p2 GROUP BY 1, 2),
t2 AS (SELECT doc_id, tf * length(gram) AS cov,
              ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY tf DESC, gram) AS rn
       FROM c2),
p3 AS (SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram
       FROM (SELECT doc_id, t,
                    unnest(generate_series(1, len(t) - 2)) AS i
             FROM toks)),
c3 AS (SELECT doc_id, gram, COUNT(*) AS tf FROM p3 GROUP BY 1, 2),
d3 AS (SELECT doc_id, SUM(tf * length(gram)) AS cov
       FROM c3 WHERE tf >= 2 GROUP BY 1)
SELECT k.doc_id,
       CAST(COALESCE(1000 * tp.cov // k.n_chars, 0) AS BIGINT)
         AS top2_milli,
       CAST(COALESCE(1000 * d.cov // k.n_chars, 0) AS BIGINT)
         AS dup3_milli
FROM toks k
LEFT JOIN (SELECT doc_id, cov FROM t2 WHERE rn = 1) tp USING (doc_id)
LEFT JOIN d3 d USING (doc_id)""",
        # geohash = Morton interleave (lon at even bits) read out 5
        # bits/char; same magic-mask ladder as zorder
        "geohash": _WG + f""",
gq AS (SELECT
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 4096.0)
                      AS BIGINT), 0), 4095) AS qy,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 8192.0)
                      AS BIGINT), 0), 8191) AS qx
  FROM geo),
g1 AS (SELECT (qx | (qx << 8)) & 16711935 AS x,
              (qy | (qy << 8)) & 16711935 AS y FROM gq),
g2 AS (SELECT (x | (x << 4)) & 252645135 AS x,
              (y | (y << 4)) & 252645135 AS y FROM g1),
g3 AS (SELECT (x | (x << 2)) & 858993459 AS x,
              (y | (y << 2)) & 858993459 AS y FROM g2),
g4 AS (SELECT (x | (x << 1)) & 1431655765 AS x,
              (y | (y << 1)) & 1431655765 AS y FROM g3),
gg AS (SELECT (x | (y << 1)) AS g FROM g4)
SELECT {" || ".join(f"substr('{_gx_mod.GEOHASH32}', CAST((g >> {s}) & 31 AS INTEGER) + 1, 1)" for s in (20, 15, 10, 5, 0))} AS ghash,
       COUNT(*) AS n_pages
FROM gg GROUP BY 1""",
        "cell_markov": _WH + """,
mv AS (SELECT cluster, hex7,
              LAG(hex7) OVER (PARTITION BY cluster
                              ORDER BY doc_id) AS from_hex
       FROM hex9)
SELECT from_hex, hex7 AS to_hex, COUNT(*) AS n_moves
FROM mv WHERE from_hex IS NOT NULL GROUP BY 1, 2""",
        # milli-grid first, then pure integer floor arithmetic — no
        # float scale factor (mirrors ann.emb_quantize)
        "emb_quantize": """
WITH u AS (SELECT vec_id, unnest(range(len(embedding))) AS dim_idx,
                  unnest(embedding) AS v FROM embeddings),
q AS (SELECT vec_id, CAST(dim_idx AS BIGINT) AS dim_idx,
             CAST(floor(1000.0 * CAST(v AS DOUBLE)) AS BIGINT) AS q
      FROM u),
st AS (SELECT dim_idx, MIN(q) AS mn,
              GREATEST(MAX(q) - MIN(q), 1) AS rng
       FROM q GROUP BY 1)
SELECT q.vec_id, q.dim_idx,
       (q.q - st.mn) * 255 // st.rng AS code
FROM q JOIN st USING (dim_idx)""",
        # milli-nat numerator convention (user_entropy) on (cluster,
        # hex7) visit counts
        "mobility_entropy": _WH + """,
c AS (SELECT cluster, hex7, COUNT(*) AS c FROM hex9 GROUP BY 1, 2),
n AS (SELECT cluster, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1)
SELECT c.cluster, MAX(n.n) AS n_pages,
  CAST(SUM(c.c * CAST(floor(-1000.0 * ln(
      CAST(c.c AS DOUBLE) / CAST(n.n AS DOUBLE))) AS BIGINT))
    AS BIGINT) AS entropy_numer_milli
FROM c JOIN n USING (cluster) GROUP BY c.cluster""",
        # all-integer: COUNT sizes, pair counts, 1000*inter // union;
        # 20-deg trajectory grid (geoext.TRAJ_CELL_DEG)
        "traj_jaccard": _WG + """,
dv AS (SELECT DISTINCT cluster,
              CAST(floor((lat + 90.0) / 20.0) AS BIGINT) * 4096
                + CAST(floor((lon + 180.0) / 20.0) AS BIGINT) AS tcell
       FROM geo),
sz AS (SELECT cluster, COUNT(*) AS s FROM dv GROUP BY 1),
pr AS (SELECT a.cluster AS c1, b.cluster AS c2, COUNT(*) AS n_inter
       FROM dv a JOIN dv b
         ON a.tcell = b.tcell AND a.cluster < b.cluster
       GROUP BY 1, 2)
SELECT c1, c2, n_inter,
       sa.s + sb.s - n_inter AS n_union,
       1000 * n_inter // (sa.s + sb.s - n_inter) AS jac_permille
FROM pr JOIN sz sa ON sa.cluster = c1
        JOIN sz sb ON sb.cluster = c2""",
        "peak_hour": _WH + """,
h AS (SELECT hex7, CAST(EXTRACT(HOUR FROM warc_ts) AS BIGINT) AS hr,
             COUNT(*) AS n
      FROM hex9 GROUP BY 1, 2),
r AS (SELECT hex7, hr, n,
             ROW_NUMBER() OVER (PARTITION BY hex7
                                ORDER BY n DESC, hr) AS rn
      FROM h)
SELECT hex7, hr AS peak_hour, CAST(n AS BIGINT) AS n_peak
FROM r WHERE rn = 1""",
        "hilbert": _hilbert_oracle(),
        # same magic-mask ladder as zorder; ceil via (i*total+7)//8
        "z_splits": _WG + f""",
q AS (SELECT
  LEAST(GREATEST(CAST(floor((lat + 90.0) / 180.0 * 65536.0)
                      AS BIGINT), 0), {_gx_mod.ZQ_MAX}) AS qy,
  LEAST(GREATEST(CAST(floor((lon + 180.0) / 360.0 * 65536.0)
                      AS BIGINT), 0), {_gx_mod.ZQ_MAX}) AS qx
  FROM geo),
s1 AS (SELECT (qx | (qx << 8)) & 16711935 AS x,
              (qy | (qy << 8)) & 16711935 AS y FROM q),
s2 AS (SELECT (x | (x << 4)) & 252645135 AS x,
              (y | (y << 4)) & 252645135 AS y FROM s1),
s3 AS (SELECT (x | (x << 2)) & 858993459 AS x,
              (y | (y << 2)) & 858993459 AS y FROM s2),
s4 AS (SELECT (x | (x << 1)) & 1431655765 AS x,
              (y | (y << 1)) & 1431655765 AS y FROM s3),
hist AS (SELECT (x | (y << 1)) >> {_gx_mod.ZPREFIX_SHIFT} AS zprefix,
                COUNT(*) AS n FROM s4 GROUP BY 1),
c AS (SELECT zprefix,
             CAST(SUM(n) OVER (ORDER BY zprefix) AS BIGINT) AS cum,
             CAST(SUM(n) OVER () AS BIGINT) AS total FROM hist),
i AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7))
      t(split_idx)),
sel AS (SELECT i.split_idx, MIN(c.zprefix) AS zprefix
        FROM i JOIN c
          ON c.cum >= (CAST(i.split_idx AS BIGINT) * c.total + 7) // 8
        GROUP BY 1)
SELECT CAST(s.split_idx AS BIGINT) AS split_idx, s.zprefix,
       c.cum AS cum_pages
FROM sel s JOIN c ON c.zprefix = s.zprefix""",
        "cluster_bbox": _WG + """,
q AS (SELECT cluster,
             CAST(floor(lat * 2000000.0 + 0.5) AS BIGINT) AS ilat,
             CAST(floor(lon * 2000000.0 + 0.5) AS BIGINT) AS ilon
      FROM geo)
SELECT cluster,
       MIN(ilat) AS mn_lat, MAX(ilat) AS mx_lat,
       MIN(ilon) AS mn_lon, MAX(ilon) AS mx_lon,
       (MAX(ilat) - MIN(ilat)) * (MAX(ilon) - MIN(ilon)) AS box_area
FROM q GROUP BY 1""",
        # smallest multiplicative hash per cell, k=3, ties by doc_id
        "cell_sample": _WH + """,
hh AS (SELECT hex7, doc_id,
              (doc_id % 1000003 * 2654435761) % 1000003 AS h
       FROM hex9),
rk AS (SELECT hex7, doc_id,
              ROW_NUMBER() OVER (PARTITION BY hex7
                                 ORDER BY h, doc_id) AS rank
       FROM hh)
SELECT hex7, doc_id, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= 3""",
        "s2_compact": _s2_compact_oracle(),
        # Top-PMI bigram collocations: occurrence-weighted marginals
        # over the bigram table, milli-nat floor quantization on the
        # identical double expression ((n*T)/(c1*c2)) the engine uses.
        "pmi_topk": f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
bg AS (SELECT ts[g.i] AS w1, ts[g.i + 1] AS w2,
              ts[g.i] || ' ' || ts[g.i + 1] AS b
       FROM t, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
cb AS (SELECT b, MIN(w1) AS w1, MIN(w2) AS w2, COUNT(*) AS n
       FROM bg GROUP BY b),
c1 AS (SELECT w1, SUM(n) AS n1 FROM cb GROUP BY w1),
c2 AS (SELECT w2, SUM(n) AS n2 FROM cb GROUP BY w2),
tt AS (SELECT SUM(n) AS tot FROM cb),
sc AS (SELECT cb.b, cb.n,
              CAST(floor(1000.0 * ln(
                  (CAST(cb.n AS DOUBLE) * CAST(tt.tot AS DOUBLE))
                  / (CAST(c1.n1 AS DOUBLE) * CAST(c2.n2 AS DOUBLE))))
                   AS BIGINT) AS pmi_milli
       FROM cb JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tt
       WHERE cb.n >= {_textops.PMI_MIN_COUNT})
SELECT b, CAST(n AS BIGINT) AS n, pmi_milli
FROM sc ORDER BY pmi_milli DESC, b LIMIT {_textops.PMI_TOPK}""",
        # Integer CUSUM change-point per event type over daily counts;
        # QUALIFY picks the max statistic with the earliest day.
        "cusum_shift": """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  COUNT(*) AS c
           FROM events GROUP BY event_type, day),
w AS (SELECT event_type, day,
             SUM(c) OVER (PARTITION BY event_type ORDER BY day) AS s,
             SUM(c) OVER (PARTITION BY event_type) AS tot,
             COUNT(*) OVER (PARTITION BY event_type) AS n,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS k
      FROM d)
SELECT event_type, CAST(day AS BIGINT) AS shift_day,
       CAST(ABS(n * s - k * tot) AS BIGINT) AS shift_stat,
       CAST(n AS BIGINT) AS n_days
FROM w
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY ABS(n * s - k * tot) DESC,
                                    day) = 1""",
        # Dunning log-likelihood keyness per source: expected counts
        # E = (a+b)*N_side/N, b-term zero when b = 0; identical double
        # parenthesization to the engine kernel.
        "keyness_topk": f"""
WITH flat AS (SELECT d.source, unnest(string_split(d.text, ' ')) AS token
              FROM documents d),
st AS (SELECT source, token, COUNT(*) AS a FROM flat
       GROUP BY source, token),
tt AS (SELECT token, SUM(a) AS t FROM st GROUP BY token),
ns AS (SELECT source, SUM(a) AS na FROM st GROUP BY source),
nn AS (SELECT SUM(a) AS n FROM st),
sc AS (SELECT st.source, st.token, st.a,
              CAST(tt.t - st.a AS BIGINT) AS b, ns.na, nn.n
       FROM st JOIN tt USING (token) JOIN ns USING (source)
            CROSS JOIN nn
       WHERE st.a >= {_textops.KEYNESS_MIN_COUNT}),
g AS (SELECT source, token, a,
        CAST(floor(1000.0 * (2.0 * (
            CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE)
                / ((CAST(a + b AS DOUBLE) * CAST(na AS DOUBLE))
                   / CAST(n AS DOUBLE)))
            + CASE WHEN b = 0 THEN 0.0 ELSE
                CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE)
                  / ((CAST(a + b AS DOUBLE) * CAST(n - na AS DOUBLE))
                     / CAST(n AS DOUBLE)))
              END))) AS BIGINT) AS g2_milli
      FROM sc)
SELECT source, token, CAST(a AS BIGINT) AS a, g2_milli
FROM g
QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY g2_milli DESC, token)
        <= {_textops.KEYNESS_TOPK}""",
        # Theil-Sen: lower median of floor(1000*(dc/dd)) over all day
        # pairs; single-day types have no pairs and are absent.
        "theilsen_slope": """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  COUNT(*) AS c
           FROM events GROUP BY event_type, day),
p AS (SELECT a.event_type,
             CAST(floor(1000.0 * (CAST(b.c - a.c AS DOUBLE)
                                  / CAST(b.day - a.day AS DOUBLE)))
                  AS BIGINT) AS sm
      FROM d a JOIN d b ON a.event_type = b.event_type
                        AND b.day > a.day),
r AS (SELECT event_type, sm,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY sm) AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM p)
SELECT event_type, CAST(sm AS BIGINT) AS slope_milli,
       CAST(m AS BIGINT) AS n_pairs
FROM r WHERE i = (m + 1) // 2""",
        # Exact integer Gini from the sorted formula; the numerator is
        # tie-order invariant, the division is integer floor division.
        "gini_by_source": """
WITH r AS (SELECT source, n_chars AS x,
                  ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY n_chars) AS i,
                  COUNT(*) OVER (PARTITION BY source) AS n,
                  SUM(n_chars) OVER (PARTITION BY source) AS sx
           FROM documents)
SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST((1000000 * SUM((2 * i - n - 1) * x))
            // (MAX(n) * MAX(sx)) AS BIGINT) AS gini_micro
FROM r GROUP BY source""",
        # Moran's I integer components over hex7 page counts with
        # ring-1 hex weights (self excluded); the scatter-to-target
        # CTE mirrors geoext.moran_i's aggregated-cell scatter.
        "moran_i": _WH + f""",
cells AS (SELECT hex7, COUNT(*) AS x FROM hex9 GROUP BY hex7),
st AS (SELECT COUNT(*) AS nn, SUM(x) AS s FROM cells),
z AS (SELECT hex7, nn * x - s AS z FROM cells, st),
offs AS (SELECT * FROM (VALUES {", ".join(
    f"({o})" for o in _gx_mod.HEX_RING1_OFFSETS if o != 0)}) t(off)),
nb AS (SELECT b.hex7 + o.off AS i, SUM(b.z) AS zn, COUNT(*) AS w
       FROM z b CROSS JOIN offs o GROUP BY b.hex7 + o.off)
SELECT (SELECT CAST(nn AS BIGINT) FROM st) AS n_cells,
       CAST(SUM(nb.w) AS BIGINT) AS w_pairs,
       CAST(SUM(z.z * nb.zn) AS BIGINT) AS num,
       (SELECT CAST(SUM(z2.z * z2.z) AS BIGINT) FROM z z2) AS den
FROM z JOIN nb ON nb.i = z.hex7""",
        # Per-doc lexical diversity; the entropy term is quantized per
        # tf VALUE before the sum, so it is reduction-order-free.
        "lexical_entropy": """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
       GROUP BY doc_id, token)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(tf * CAST(floor(1000.0 * ln(CAST(tf AS DOUBLE)))
                          AS BIGINT)) AS BIGINT) AS ent_term_milli
FROM tf GROUP BY doc_id""",
        # Fano factor: numerator n*s2 - s1^2 >= 0, so integer floor
        # division is engine-agnostic.
        "fano_factor": """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  COUNT(*) AS c
           FROM events GROUP BY event_type, day),
m AS (SELECT event_type, SUM(c) AS s1, SUM(c * c) AS s2,
             COUNT(*) AS n
      FROM d GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CAST((1000000 * (n * s2 - s1 * s1)) // (n * s1) AS BIGINT)
           AS fano_micro
FROM m""",
        # LISA quadrant labels: same CTE chain as moran_i, per-cell
        # output with sign-quadrant CASE.
        "lisa_cells": _WH + f""",
cells AS (SELECT hex7, COUNT(*) AS x FROM hex9 GROUP BY hex7),
st AS (SELECT COUNT(*) AS nn, SUM(x) AS s FROM cells),
z AS (SELECT hex7, nn * x - s AS z FROM cells, st),
offs AS (SELECT * FROM (VALUES {", ".join(
    f"({o})" for o in _gx_mod.HEX_RING1_OFFSETS if o != 0)}) t(off)),
nb AS (SELECT b.hex7 + o.off AS i, SUM(b.z) AS zn, COUNT(*) AS w
       FROM z b CROSS JOIN offs o GROUP BY b.hex7 + o.off)
SELECT CAST(z.hex7 AS BIGINT) AS hex7, CAST(z.z AS BIGINT) AS z,
       CAST(nb.zn AS BIGINT) AS zn, CAST(nb.w AS BIGINT) AS w,
       CASE WHEN z.z > 0 AND nb.zn > 0 THEN 'HH'
            WHEN z.z < 0 AND nb.zn < 0 THEN 'LL'
            WHEN z.z > 0 AND nb.zn < 0 THEN 'HL'
            WHEN z.z < 0 AND nb.zn > 0 THEN 'LH'
            ELSE 'NS' END AS label
FROM z JOIN nb ON nb.i = z.hex7""",
        # Zipf components: rank over (freq DESC, token ASC) — within a
        # frequency run the rank SET is fixed, so the quantized sums
        # are tie-assignment independent (the engine exploits this).
        "zipf_fit": """
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
              FROM documents),
v AS (SELECT token, COUNT(*) AS f FROM toks GROUP BY token),
r AS (SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, token) AS rank
      FROM v),
q AS (SELECT CAST(floor(1000.0 * ln(CAST(rank AS DOUBLE)))
                  AS BIGINT) AS lx,
             CAST(floor(1000.0 * ln(CAST(f AS DOUBLE)))
                  AS BIGINT) AS ly
      FROM r)
SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
       CAST(SUM(lx) AS BIGINT) AS sx,
       CAST(SUM(ly) AS BIGINT) AS sy,
       CAST(SUM(lx * ly) AS BIGINT) AS sxy,
       CAST(SUM(lx * lx) AS BIGINT) AS sxx
FROM q""",
        # Knox: per-cell windowed pair count = (ordered pairs with
        # b.ts <= a.ts + W) - n(n+1)/2 — depends only on the timestamp
        # multiset, so it mirrors the engine's searchsorted exactly.
        "knox_pairs": _WH + f""",
sel AS (SELECT hex7, epoch_us(warc_ts) AS ts FROM hex9),
pc AS (SELECT a.hex7, COUNT(*) AS cnt
       FROM sel a JOIN sel b
         ON a.hex7 = b.hex7 AND b.ts <= a.ts + {_gx_mod.KNOX_WINDOW_US}
       GROUP BY a.hex7),
nn AS (SELECT hex7, COUNT(*) AS n FROM sel GROUP BY hex7)
SELECT CAST(nn.hex7 AS BIGINT) AS hex7, CAST(nn.n AS BIGINT) AS n_pages,
       CAST(pc.cnt - nn.n * (nn.n + 1) // 2 AS BIGINT) AS pairs
FROM nn JOIN pc USING (hex7)""",
        # Division-free two-sample KS: D*na*nb as max over the global
        # distinct-length grid of |nb*A - na*B|.
        "ks_drift": """
WITH v AS (SELECT source, n_chars AS x, COUNT(*) AS c FROM documents
           GROUP BY source, n_chars),
g AS (SELECT x, SUM(c) AS c FROM v GROUP BY x),
s AS (SELECT source, SUM(c) AS na FROM v GROUP BY source),
tot AS (SELECT SUM(c) AS n FROM v),
grid AS (SELECT s.source, s.na, g.x FROM s CROSS JOIN g),
j AS (SELECT grid.source, grid.na, grid.x, COALESCE(v.c, 0) AS c
      FROM grid LEFT JOIN v
        ON v.source = grid.source AND v.x = grid.x),
cums AS (SELECT source, na, x,
                SUM(c) OVER (PARTITION BY source ORDER BY x) AS ca
         FROM j),
gc AS (SELECT x, SUM(c) OVER (ORDER BY x) AS cg FROM g)
SELECT c1.source, CAST(MAX(c1.na) AS BIGINT) AS n_src,
       CAST(MAX(ABS((t.n - c1.na) * c1.ca
                    - c1.na * (gc.cg - c1.ca))) AS BIGINT) AS d_scaled
FROM cums c1 JOIN gc USING (x) CROSS JOIN tot t
GROUP BY c1.source""",
        "pq_codes": _pq_oracle(),
        # Lag-1 autocorrelation components; adjacency = day delta 1.
        "acf_lag1": """
WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                  COUNT(*) AS c
           FROM events GROUP BY event_type, day),
w AS (SELECT event_type, day, c,
             LEAD(day) OVER (PARTITION BY event_type
                             ORDER BY day) AS nday,
             LEAD(c) OVER (PARTITION BY event_type
                           ORDER BY day) AS nc
      FROM d)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(c) AS BIGINT) AS s1,
       CAST(SUM(c * c) AS BIGINT) AS s2,
       CAST(SUM(CASE WHEN nday = day + 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_adj,
       CAST(SUM(CASE WHEN nday = day + 1 THEN c * nc ELSE 0 END)
            AS BIGINT) AS sxy
FROM w GROUP BY event_type""",
        # Doubled Mann-Whitney U (ties contribute 1), division-free.
        "mannwhitney_u": """
WITH v AS (SELECT source, n_chars AS x, COUNT(*) AS c FROM documents
           GROUP BY source, n_chars),
g AS (SELECT x, SUM(c) AS c FROM v GROUP BY x),
gb AS (SELECT x, c AS cg,
              COALESCE(SUM(c) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS gbelow
       FROM g),
s AS (SELECT source FROM v GROUP BY source),
grid AS (SELECT s.source, gb.x, gb.cg, gb.gbelow
         FROM s CROSS JOIN gb),
j AS (SELECT grid.source, grid.x, grid.cg, grid.gbelow,
             COALESCE(v.c, 0) AS a
      FROM grid LEFT JOIN v
        ON v.source = grid.source AND v.x = grid.x),
k AS (SELECT source, x, a, cg - a AS b_at,
             gbelow - COALESCE(SUM(a) OVER (PARTITION BY source
               ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS bbelow
      FROM j)
SELECT source, CAST(SUM(a) AS BIGINT) AS n_src,
       CAST(SUM(a * (2 * bbelow + b_at)) AS BIGINT) AS u2
FROM k GROUP BY source""",
        # Peak concurrency: the step-function max occurs at a start t
        # with value #{ts in (t-W, t]}; DISTINCT starts avoid
        # double-counted duplicate (type, t) evaluation rows.
        "peak_concurrency": """
WITH e AS (SELECT event_type, epoch_us(ts) AS t FROM events),
a AS (SELECT DISTINCT event_type, t FROM e),
c AS (SELECT a.event_type, a.t, COUNT(*) AS conc
      FROM a JOIN e b
        ON b.event_type = a.event_type
       AND b.t > a.t - 1800000000 AND b.t <= a.t
      GROUP BY a.event_type, a.t)
SELECT event_type, CAST(conc AS BIGINT) AS conc,
       CAST(t AS BIGINT) AS at_us
FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY conc DESC, t) = 1""",
        # Benford first digit via string head (engine: integer
        # repeated division — identical for positive ints).
        "benford": """
WITH d AS (SELECT source,
                  CAST(substr(CAST(n_chars AS VARCHAR), 1, 1) AS BIGINT)
                      AS digit
           FROM documents WHERE n_chars >= 1)
SELECT source, digit, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(FLOOR(1000 * log10(1 + 1.0 / digit)) AS BIGINT)
           AS exp_milli
FROM d GROUP BY source, digit""",
        # Exact chi-square components via HUGEINT floor division
        # (engine: arbitrary-precision Python ints).
        "chi2_contingency": """
WITH o AS (SELECT lang, source, CAST(COUNT(*) AS HUGEINT) AS o
           FROM documents GROUP BY lang, source),
r AS (SELECT lang, SUM(o) AS r FROM o GROUP BY lang),
c AS (SELECT source, SUM(o) AS c FROM o GROUP BY source),
n AS (SELECT SUM(o) AS n FROM o)
SELECT o.lang, o.source, CAST(o.o AS BIGINT) AS o,
       CAST(r.r AS BIGINT) AS r_tot, CAST(c.c AS BIGINT) AS c_tot,
       CAST(n.n AS BIGINT) AS n_tot,
       CAST(((o.o * n.n - r.r * c.c) * (o.o * n.n - r.r * c.c)
             * 1000000) // (r.r * c.c * n.n) AS BIGINT) AS comp_micro
FROM o JOIN r USING (lang) JOIN c USING (source) CROSS JOIN n""",
        # Vocabulary growth on the power-of-two grid; fd < t counts
        # tokens first seen among doc_id 0..t-1.
        "heaps_law": """
WITH m AS (SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS n FROM documents),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
f AS (SELECT token, MIN(doc_id) AS fd FROM tok GROUP BY token),
grid AS (SELECT DISTINCT
                LEAST(CAST(power(2, k) AS BIGINT), m.n) AS t
         FROM unnest(generate_series(0, 62)) AS g(k), m
         WHERE power(2, k) < 2 * m.n)
SELECT grid.t AS n_docs,
       CAST(COUNT(*) FILTER (WHERE f.fd < grid.t) AS BIGINT) AS vocab
FROM grid CROSS JOIN f GROUP BY grid.t""",
        # Last-touch attribution: rn=1 over in-window strictly-prior
        # non-purchase events; window emptiness == latest-touch-stale.
        "attribution": """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
                  CAST(ROUND(value * 1000) AS BIGINT) AS vm
           FROM events),
p AS (SELECT * FROM e WHERE event_type = 'purchase'),
b AS (SELECT p.event_id AS pid, x.event_type AS src_type,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY x.t DESC, x.event_id DESC)
                 AS rn
      FROM p JOIN e x
        ON x.user_id = p.user_id AND x.event_type <> 'purchase'
       AND (x.t < p.t OR (x.t = p.t AND x.event_id < p.event_id))
       AND x.t >= p.t - 1800000000),
a AS (SELECT pid, src_type FROM b WHERE rn = 1)
SELECT COALESCE(a.src_type, '(none)') AS src_type,
       CAST(COUNT(*) AS BIGINT) AS n_conv,
       CAST(SUM(p.vm) AS BIGINT) AS value_milli
FROM p LEFT JOIN a ON a.pid = p.event_id
GROUP BY COALESCE(a.src_type, '(none)')""",
        # IDW onto empty cells: 18-offset scatter with 1/d² integer
        # weights; NOT EXISTS mirrors the folded occupancy marker.
        "grid_idw": _WH + f""",
cells AS (SELECT hex7, COUNT(*) AS n FROM hex9 GROUP BY hex7),
offs AS (SELECT * FROM (VALUES {", ".join(
    f"({o}, {_gx_mod.IDW_W_RING1})"
    for o in _gx_mod.HEX_RING1_OFFSETS[1:])}, {", ".join(
    f"({o}, {_gx_mod.IDW_W_RING2})"
    for o in _gx_mod.HEX_RING2_OFFSETS)}) t(off, w)),
sc AS (SELECT c.hex7 + o.off AS hex7,
              SUM(o.w * c.n) AS num, SUM(o.w) AS den
       FROM cells c CROSS JOIN offs o GROUP BY 1)
SELECT CAST(sc.hex7 AS BIGINT) AS hex7,
       CAST(sc.num AS BIGINT) AS num, CAST(sc.den AS BIGINT) AS den,
       CAST((1000 * sc.num) // sc.den AS BIGINT) AS est_milli
FROM sc
WHERE NOT EXISTS (SELECT 1 FROM cells c2 WHERE c2.hex7 = sc.hex7)""",
        # Rolling exact median over the trailing 7 OBSERVED days (ROWS
        # frame); doubled so even frames stay integer.
        "rolling_median": """
WITH d AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day,
                  COUNT(*) AS c
           FROM events GROUP BY event_type, day)
SELECT event_type, CAST(day AS BIGINT) AS day, CAST(c AS BIGINT) AS c,
       CAST(2 * median(c) OVER (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
           AS med2
FROM d""",
        # Session paths: sessionize with (ts, event_id) tie order,
        # first 8 types per session, ordered string_agg, top-20.
        "session_path_topk": """
WITH d AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM d),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_idx
                               ORDER BY ts, event_id) AS rn
  FROM s),
p AS (
  SELECT user_id, session_idx,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM r WHERE rn <= 8 GROUP BY user_id, session_idx)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY path ORDER BY n DESC, path LIMIT 20""",
        # Watermark audit: running max ts over arrival (event_id)
        # order, strictly prior rows.
        "out_of_order": """
WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS t
           FROM events),
w AS (SELECT event_type, t,
             MAX(t) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM e)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (WHERE t < pm) AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(pm - t) FILTER (WHERE t < pm), 0) AS BIGINT)
           AS max_late_us,
       CAST(COALESCE(SUM(pm - t) FILTER (WHERE t < pm), 0) AS BIGINT)
           AS sum_late_us
FROM w GROUP BY event_type""",
        # Simplified silhouette over the SAME 2-iteration Lloyd chain
        # as the kmeans oracle; b2 = second-smallest centroid distance
        # (rn=2 in (dist, cid) order), s_milli integer floor division.
        "silhouette": _kmeans_d2_cte() + """,
r AS (SELECT vec_id, cid, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist, cid) AS rn
      FROM d2),
ab AS (SELECT a.vec_id, a.cid, a.dist AS a2, b.dist AS b2
       FROM r a JOIN r b ON b.vec_id = a.vec_id
       WHERE a.rn = 1 AND b.rn = 2)
SELECT CAST(cid AS BIGINT) AS cluster,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN b2 > 0 THEN (1000 * (b2 - a2)) // b2
                     ELSE 0 END) AS BIGINT) AS s_milli_sum
FROM ab GROUP BY cid""",
        # RRF fusion of the search_topk and ann_topk(query 0) mirrors;
        # FULL OUTER JOIN == the union-of-lists fold.
        "hybrid_rrf": f"""
WITH flat AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
toks AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM flat
  WHERE token IN {tuple(_textops.SEARCH_TERMS)!r}
  GROUP BY doc_id, token),
dfs AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
sc AS (
  SELECT t.doc_id,
         CAST(SUM(t.tf * CAST(floor(1000.0 *
              ln(CAST(nd.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)))
              AS BIGINT)) AS BIGINT) AS score_milli
  FROM toks t JOIN dfs d ON d.token = t.token, nd
  GROUP BY t.doc_id),
lex AS (SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score_milli DESC, doc_id)
                   AS r
        FROM sc ORDER BY score_milli DESC, doc_id
        LIMIT {_textops.SEARCH_TOPK}),
q AS (SELECT vec_id AS query_id, embedding FROM embeddings
      ORDER BY vec_id LIMIT 1),
sims AS (SELECT e.vec_id AS doc_id,
                list_cosine_similarity(q.embedding, e.embedding) AS sim
         FROM q, embeddings e WHERE e.vec_id != q.query_id),
sem AS (SELECT doc_id, r FROM (
          SELECT doc_id,
                 ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS r
          FROM sims) WHERE r <= {_ann.TOPK_DEFAULT}),
u AS (SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             COALESCE(1000 // ({_ann.RRF_C} + l.r), 0)
               + COALESCE(1000 // ({_ann.RRF_C} + s.r), 0) AS rrf_milli,
             CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END AS in_lex,
             CASE WHEN s.doc_id IS NULL THEN 0 ELSE 1 END AS in_sem
      FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(rrf_milli AS BIGINT) AS rrf_milli,
       CAST(in_lex AS BIGINT) AS in_lex,
       CAST(in_sem AS BIGINT) AS in_sem
FROM u ORDER BY rrf_milli DESC, doc_id LIMIT {_ann.RRF_TOPK}""",
        # Mann-Kendall S per cell over daily counts: strict day<day
        # self-join, SIGN sum; cells with one day get s=0 via the
        # LEFT JOIN.
        "emerging_hotspots": _WH + """,
cd AS (SELECT hex7, epoch_us(warc_ts) // 86400000000 AS day,
              COUNT(*) AS c
       FROM hex9 GROUP BY hex7, day),
nd AS (SELECT hex7, COUNT(*) AS n_days FROM cd GROUP BY hex7),
p AS (SELECT a.hex7, SIGN(b.c - a.c) AS sg
      FROM cd a JOIN cd b ON b.hex7 = a.hex7 AND b.day > a.day)
SELECT nd.hex7, CAST(nd.n_days AS BIGINT) AS n_days,
       CAST(COALESCE(SUM(p.sg), 0) AS BIGINT) AS s
FROM nd LEFT JOIN p ON p.hex7 = nd.hex7
GROUP BY nd.hex7, nd.n_days""",
        # Title field extraction: same regex class over decode(html);
        # the integrity probe mirrors the synth title contract.
        "extract_title": _W + """
SELECT doc_id,
       regexp_extract(decode(html), '<title>([^<]*)</title>', 1)
           AS title,
       CAST(length(regexp_extract(decode(html),
            '<title>([^<]*)</title>', 1)) AS BIGINT) AS n_title_chars,
       CAST(CASE WHEN regexp_extract(decode(html),
                 '<title>([^<]*)</title>', 1)
                 = 'doc ' || CAST(doc_id AS VARCHAR)
            THEN 1 ELSE 0 END AS BIGINT) AS title_ok
FROM pages""",
        # Exact set-similarity self-join: ALL pairs with shingle
        # Jaccard >= tau, computed directly (shared-shingle self-join
        # + exact integer milli-Jaccard).  The engine's prefix filter
        # (recall 1.0 by the AllPairs/PPJoin bound) must reproduce
        # this exactly; floor(1000*J) >= tau  <=>  J >= tau/1000 for
        # an integer threshold, so both sides filter identically.
        "ppjoin_pairs": "WITH " + _minhash_sql_chain() + f""",
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
ov AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS o
       FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       1000 * o // (sa.sz + sb.sz - o) AS jaccard_milli
FROM ov
JOIN sizes sa ON da = sa.doc_id
JOIN sizes sb ON db = sb.doc_id
WHERE 1000 * o >= {_dedup.PPJOIN_TAU_MILLI} * (sa.sz + sb.sz - o)""",
        # Integer-exact polygon geometry (shoelace area2, L1 perimeter,
        # envelope over the milli-degree ring coords) + PIP page count.
        # SUM(BIGINT) is HUGEINT in DuckDB -> cast back to BIGINT.
        "poly_geom": _WP + "," + _synth.sql_polygon_edges_md() + """,
cnt AS (SELECT poly_id, COUNT(*) AS n_pages FROM pip GROUP BY poly_id),
geomt AS (SELECT poly_id,
                 COUNT(*) AS n_vertices,
                 CAST(abs(SUM(x1 * y2 - x2 * y1)) AS BIGINT) AS area2_md2,
                 CAST(SUM(abs(x2 - x1) + abs(y2 - y1)) AS BIGINT)
                   AS perim_l1_md,
                 MIN(x1) AS minx_md, MIN(y1) AS miny_md,
                 MAX(x1) AS maxx_md, MAX(y1) AS maxy_md
          FROM edges_md GROUP BY poly_id)
SELECT g.poly_id, p.class_id, g.n_vertices, g.area2_md2, g.perim_l1_md,
       g.minx_md, g.miny_md, g.maxx_md, g.maxy_md,
       COALESCE(c.n_pages, 0) AS n_pages
FROM geomt g
JOIN polys p USING (poly_id)
LEFT JOIN cnt c USING (poly_id)""",
        # Quality-based cluster representative: the recursive-CC chain
        # + a (n_chars DESC, doc_id ASC) window — mirror of the
        # engine's packed-max aggregate.
        "dedup_best": "WITH RECURSIVE "
        + _minhash_sql_chain().lstrip() + """,
edges AS (SELECT doc_a AS u, doc_b AS v FROM cand
          UNION ALL SELECT doc_b, doc_a FROM cand),
reach(n, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, r.l FROM reach r JOIN edges e ON e.u = r.n
),
cc AS (SELECT n AS doc_id, MIN(l) AS cluster FROM reach GROUP BY n),
j AS (SELECT cc.cluster, d.doc_id,
             CAST(length(d.text) AS BIGINT) AS n_chars
      FROM cc JOIN documents d ON d.doc_id = cc.doc_id),
best AS (SELECT cluster, doc_id AS kept_doc, n_chars AS kept_n_chars,
                ROW_NUMBER() OVER (PARTITION BY cluster
                                   ORDER BY n_chars DESC, doc_id) AS rn,
                COUNT(*) OVER (PARTITION BY cluster) AS n_members
         FROM j)
SELECT cluster, kept_doc, kept_n_chars, n_members
FROM best WHERE rn = 1""",
        # Content-defined chunking: boundary after token i wherever the
        # token-3-gram rolling hash (the shingle expression) is 0 mod
        # div; chunk identity = (sum of token hashes mod M, length).
        # SUM(BIGINT) is HUGEINT in DuckDB -> cast back after % M.
        "cdc_chunks": f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
              FROM documents),
tok AS (SELECT doc_id, unnest(generate_series(1, len(ts))) AS i, ts
        FROM toks),
th AS (SELECT doc_id, i,
              ('0x' || substr(md5(ts[i]), 1, 15))::BIGINT
                % {_dedup.MERSENNE} AS h
       FROM tok),
b AS (SELECT doc_id, i, h,
             CASE WHEN i >= 3 AND
               ((LAG(h, 2) OVER w * {_dedup.SH_C1} % {_dedup.MERSENNE}
                 + LAG(h, 1) OVER w * {_dedup.SH_C2} % {_dedup.MERSENNE}
                 + h * {_dedup.SH_C3} % {_dedup.MERSENNE})
                % {_dedup.MERSENNE}) % {_textops.CDC_DIV} = 0
             THEN 1 ELSE 0 END AS bf
      FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
c AS (SELECT doc_id, i, h,
             COALESCE(SUM(bf) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS ck
      FROM b),
ch AS (SELECT doc_id, ck,
              CAST(SUM(h) % {_dedup.MERSENNE} AS BIGINT) AS chunk_sum,
              COUNT(*) AS chunk_len
       FROM c GROUP BY doc_id, ck)
SELECT chunk_sum, chunk_len,
       COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occur
FROM ch GROUP BY chunk_sum, chunk_len
HAVING COUNT(*) >= {_textops.CDC_MIN_OCCUR}""",
        # Sketch calibration: equal-signature-component count / NUM_PERM
        # (the MinHash Jaccard estimator) next to the exact shingle
        # Jaccard, per LSH candidate pair.
        "minhash_est": "WITH " + _minhash_sql_chain() + f""",
cnts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS i
          FROM cand p
          JOIN sh x ON x.doc_id = p.doc_a
          JOIN sh y ON y.doc_id = p.doc_b AND y.sh = x.sh
          GROUP BY p.doc_a, p.doc_b),
esteq AS (SELECT p.doc_a, p.doc_b,
                 COUNT(*) FILTER (WHERE sa.sig = sb.sig) AS neq
          FROM cand p
          JOIN sigs sa ON sa.doc_id = p.doc_a
          JOIN sigs sb ON sb.doc_id = p.doc_b AND sb.perm = sa.perm
          GROUP BY p.doc_a, p.doc_b)
SELECT p.doc_a, p.doc_b,
       1000 * e.neq // {_dedup.NUM_PERM} AS est_milli,
       (1000 * COALESCE(i.i, 0))
         // (ca.n + cb.n - COALESCE(i.i, 0)) AS jaccard_milli
FROM cand p
JOIN cnts ca ON ca.doc_id = p.doc_a
JOIN cnts cb ON cb.doc_id = p.doc_b
JOIN esteq e ON e.doc_a = p.doc_a AND e.doc_b = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b""",
        # Incremental-crawl novelty: newest-source docs minus those
        # with a verified (exact Jaccard >= 500) near-dup in an older
        # source.
        "novelty_docs": "WITH " + _minhash_sql_chain() + """,
cnts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS i
          FROM cand p
          JOIN sh x ON x.doc_id = p.doc_a
          JOIN sh y ON y.doc_id = p.doc_b AND y.sh = x.sh
          GROUP BY p.doc_a, p.doc_b),
ver AS (SELECT p.doc_a, p.doc_b
        FROM cand p
        JOIN cnts ca ON ca.doc_id = p.doc_a
        JOIN cnts cb ON cb.doc_id = p.doc_b
        LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
        WHERE 1000 * COALESCE(i.i, 0)
              >= 500 * (ca.n + cb.n - COALESCE(i.i, 0))),
mx AS (SELECT MAX(source) AS s FROM documents),
crossdup AS (
  SELECT v.doc_a AS doc_id FROM ver v, mx
  JOIN documents da ON da.doc_id = v.doc_a
  JOIN documents db ON db.doc_id = v.doc_b
  WHERE da.source = mx.s AND db.source <> da.source
  UNION
  SELECT v.doc_b FROM ver v, mx
  JOIN documents da ON da.doc_id = v.doc_a
  JOIN documents db ON db.doc_id = v.doc_b
  WHERE db.source = mx.s AND da.source <> db.source)
SELECT d.doc_id, d.lang
FROM documents d, mx
WHERE d.source = mx.s
  AND NOT EXISTS (SELECT 1 FROM crossdup c WHERE c.doc_id = d.doc_id)""",
        # Mutual-kNN graph: the knn_cell chain self-joined on the
        # reversed pair, normalized to doc_a < doc_b.
        "mutual_knn": _WH + f""",
knn AS (
  SELECT a.doc_id, b.doc_id AS neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.doc_id
           ORDER BY (a.lat - b.lat) * (a.lat - b.lat)
                    + (a.lon - b.lon) * (a.lon - b.lon), b.doc_id
         ) AS "rank"
  FROM hex9 a JOIN hex9 b ON a.hex7 = b.hex7 AND a.doc_id != b.doc_id
),
topk AS (SELECT doc_id, neighbor_id, "rank" FROM knn
         WHERE "rank" <= {_knn.K_DEFAULT})
SELECT x.doc_id AS doc_a, x.neighbor_id AS doc_b,
       x."rank" AS rank_ab, y."rank" AS rank_ba
FROM topk x
JOIN topk y ON y.doc_id = x.neighbor_id AND y.neighbor_id = x.doc_id
WHERE x.doc_id < x.neighbor_id""",
        # Zone-map pruned range scan == full-scan filter (pruning is a
        # superset screen; the exact predicate runs on survivors).
        "zonemap_range": _WG + """
SELECT doc_id, lat, lon FROM geo
WHERE lat >= 5.0 AND lat <= 48.0""",
        # CDC span removal: the cdc_chunks chain extended with the
        # token strings, a min-(doc_id, ck) winner per content key,
        # and a string_agg rewrite of the kept tokens.
        "span_dedup": f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
              FROM documents),
tok AS (SELECT doc_id, unnest(generate_series(1, len(ts))) AS i, ts
        FROM toks),
th AS (SELECT doc_id, i, ts[i] AS tk,
              ('0x' || substr(md5(ts[i]), 1, 15))::BIGINT
                % {_dedup.MERSENNE} AS h
       FROM tok),
b AS (SELECT doc_id, i, tk, h,
             CASE WHEN i >= 3 AND
               ((LAG(h, 2) OVER w * {_dedup.SH_C1} % {_dedup.MERSENNE}
                 + LAG(h, 1) OVER w * {_dedup.SH_C2} % {_dedup.MERSENNE}
                 + h * {_dedup.SH_C3} % {_dedup.MERSENNE})
                % {_dedup.MERSENNE}) % {_textops.CDC_DIV} = 0
             THEN 1 ELSE 0 END AS bf
      FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
c AS (SELECT doc_id, i, tk, h,
             COALESCE(SUM(bf) OVER (PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS ck
      FROM b),
ch AS (SELECT doc_id, ck,
              CAST(SUM(h) % {_dedup.MERSENNE} AS BIGINT) AS csum,
              COUNT(*) AS clen
       FROM c GROUP BY doc_id, ck),
win AS (SELECT csum, clen, MIN(doc_id * 1048576 + ck) AS w
        FROM ch GROUP BY csum, clen),
keep AS (SELECT ch.doc_id, ch.ck
         FROM ch JOIN win ON win.csum = ch.csum AND win.clen = ch.clen
         WHERE ch.doc_id * 1048576 + ch.ck = win.w),
agg AS (SELECT c.doc_id,
               string_agg(c.tk, ' ' ORDER BY c.i) AS text_clean
        FROM c JOIN keep k ON k.doc_id = c.doc_id AND k.ck = c.ck
        GROUP BY c.doc_id)
SELECT d.doc_id, COALESCE(a.text_clean, '') AS text_clean
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""",
        # Asymmetric containment mirror: same shingle/candidate chain as
        # minhash_verified, floor-divided by EACH side's shingle count.
        "containment_pairs": "WITH " + _minhash_sql_chain() + """,
cnts AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT p.doc_a, p.doc_b, COUNT(*) AS i
          FROM cand p
          JOIN sh x ON x.doc_id = p.doc_a
          JOIN sh y ON y.doc_id = p.doc_b AND y.sh = x.sh
          GROUP BY p.doc_a, p.doc_b)
SELECT p.doc_a, p.doc_b,
       (1000 * COALESCE(i.i, 0)) // ca.n AS contain_a_milli,
       (1000 * COALESCE(i.i, 0)) // cb.n AS contain_b_milli
FROM cand p
JOIN cnts ca ON ca.doc_id = p.doc_a
JOIN cnts cb ON cb.doc_id = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b""",
        # KMV mirror: k-th smallest distinct shingle hash per source
        # (row_number over the shared sh chain), (k-1)*M // h_k.
        "kmv_distinct": "WITH " + _minhash_sql_chain() + f""",
ssh AS (SELECT DISTINCT d.source, s.sh
        FROM sh s JOIN documents d ON d.doc_id = s.doc_id),
rk AS (SELECT source, sh,
              row_number() OVER (PARTITION BY source ORDER BY sh) AS rn
       FROM ssh),
cnt AS (SELECT source, COUNT(*) AS n FROM ssh GROUP BY source)
SELECT c.source,
       COALESCE(k.sh, -1) AS kth_hash,
       CASE WHEN c.n >= {_dedup.KMV_K}
            THEN CAST({(_dedup.KMV_K - 1)} AS BIGINT)
                 * {_dedup.MERSENNE} // k.sh
            ELSE c.n END AS est_distinct
FROM cnt c
LEFT JOIN (SELECT source, sh FROM rk WHERE rn = {_dedup.KMV_K}) k
  ON k.source = c.source""",
        # Boilerplate mirror: corpus-wide shingle df over the shared sh
        # chain; hot set = df >= BOILER_MIN_DF; per-doc floor fraction.
        "boiler_score": "WITH " + _minhash_sql_chain() + f""",
dfb AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
hot AS (SELECT sh FROM dfb WHERE df >= {_textops.BOILER_MIN_DF}),
tot AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
bl AS (SELECT s.doc_id, COUNT(*) AS nb
       FROM sh s JOIN hot h ON h.sh = s.sh GROUP BY s.doc_id)
SELECT t.doc_id, t.n_sh, COALESCE(b.nb, 0) AS n_boiler,
       1000 * COALESCE(b.nb, 0) // t.n_sh AS boiler_milli
FROM tot t LEFT JOIN bl b ON b.doc_id = t.doc_id""",
        "hits_scores": _graph.hits_oracle_sql(),
        "kcore_nodes": _graph.kcore_oracle_sql(),
    }
