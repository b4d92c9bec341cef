"""proj_spark — a PySpark-native spatial-join + tiling engine.

The coordinate kernel re-implements the projection/datum math of PROJ 6.3.0
(reference at /root/reference, studied for semantics only) as vectorized
NumPy batch functions, exposed to Spark as Arrow-batched pandas UDFs.
The dataflow layer (scans, cell indexing, point-in-polygon joins, kNN,
tiling, dedup) is idiomatic Spark DataFrame code.

Public surface:
    create(projstring)            -> Operation (fwd/inv batch API)
    proj_spark.spark.*            -> pandas-UDF wrappers / column helpers
    proj_spark.spatial.*          -> cells, tiles, PIP join, kNN
    proj_spark.text.*             -> dedup / text-analysis operators
"""

from proj_spark.projstring import create, Pipeline
from proj_spark.planner import crs_to_crs, CRSTransform
from proj_spark.ellipsoids import Ellipsoid, get_ellipsoid

__version__ = "0.1.0"

__all__ = ["create", "Pipeline", "Ellipsoid", "get_ellipsoid", "__version__"]
