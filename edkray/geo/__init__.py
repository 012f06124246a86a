"""Pure-numpy geospatial kernels (no GDAL/shapely/h3 dependencies).

Replaces the reference's GDAL/OSR/shapely usage (utilities/geo.py,
utilities/transform.py, classes/tile.py) with vectorized numpy:

- :mod:`edkray.geo.cells`    quadtree cells (SQL-reproducible) — the
                             grouping/shuffle keys for the tiling join.
- :mod:`edkray.geo.hexgrid`  H3-style aperture-7 hexagonal hierarchy.
- :mod:`edkray.geo.s2`       S2 cell ids/tokens (Hilbert-curve quadtree
                             on the cube, public algorithm).
- :mod:`edkray.geo.pip`      vectorized ray-casting point-in-polygon +
                             a bbox grid index (STRtree replacement).
- :mod:`edkray.geo.distance` haversine / unit-vector kNN kernels.
"""

from edkray.geo.cells import quadcell, quadcell_parent, quadcell_lonlat  # noqa: F401
from edkray.geo.distance import haversine_km, knn_haversine  # noqa: F401
