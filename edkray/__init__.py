"""edkray — a Ray-Data-native spatial-join + tiling / web-corpus engine.

A from-scratch rebuild of the data-processing capabilities of
earth-data-kit (the reference geospatial stitching toolkit) re-expressed
Ray-Data-first over Arrow batches:

- ``edkray.geo``       pure-numpy geospatial kernels (cell indexes, PIP,
                       spatial index, haversine) — no GDAL/shapely.
- ``edkray.ops``       Ray Data operators: joins, dedup, text analysis,
                       similarity search, windows, aggregation helpers.
- ``edkray.sources``   template expansion / discovery / catalog
                       (the reference's ``Dataset.discover`` analogue).
- ``edkray.pipelines`` the flagship spatial-join + tiling pipeline with
                       per-partition checkpoint manifests.

Nothing here calls ``ray.init``; callers own the Ray session.
"""

__version__ = "0.1.0"
