"""usgs_lidar_spark — a PySpark-native analytics engine.

Brand-new engine with the query and data-processing capabilities of the
reference `sel6/USGS-LIDAR` (a single-machine pandas/PDAL LIDAR tool),
re-expressed as idiomatic Spark DataFrame / SQL plans and extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis). See SURVEY.md for the operator inventory this implements.

Design rules (SURVEY.md §7):
  * everything is a DataFrame transformation built from Catalyst built-ins;
  * UDFs only where provably unavoidable (exact point-in-polygon, general
    EPSG reprojection) and then always Arrow-batched pandas UDFs;
  * no driver-side collect() inside operators — scalar subqueries are
    broadcast cross-joins;
  * broadcast the small side of every dimension join;
  * partition/cluster layout is part of every sink's contract.
"""

__version__ = "0.1.0"

from usgs_lidar_spark.session import get_spark  # noqa: F401
from usgs_lidar_spark.catalog import load_table, load_tables, register_views  # noqa: F401
