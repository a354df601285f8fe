"""geo_inference_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch re-expression of NRCan/geo-inference's capabilities
(reference, read-only, at /root/reference) as idiomatic Ray Data
pipelines over Arrow batches: deterministic geocoding of Common-Crawl
style web pages, H3/S2-style cell encoding, broadcast STRtree
point-in-polygon joins, cell-local kNN, overlapped-tile scoring with
Hann-window merge matching the reference's tiling geometry
(geo_inference/geo_dask.py), mask polygonization and YOLO/COCO export,
plus the training-data operators (dedup, ANN, text analysis) a 100 TB
pipeline needs.
"""

__version__ = "0.1.0"
