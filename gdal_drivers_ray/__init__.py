"""gdal_drivers_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch re-expression of the capabilities of melowntech/gdal-drivers
(reference at /root/reference, cited per function) as streaming Ray Data
pipelines over Arrow batches: tile decode, tile-grid / cell-id assignment,
quadtree masks, weighted mosaics, MVT-style vector tiles, keyed tile stores,
plus the large-scale training-data operators (dedup, ANN, text analysis).

Library code never calls ``ray.init()`` — sessions are owned by the caller
(tests' conftest fixture, bench.py, or the driver).
"""

__version__ = "0.1.0"
