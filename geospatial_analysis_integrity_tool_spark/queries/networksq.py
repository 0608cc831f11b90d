"""Network/graph queries: connected components over endpoint-coincidence.

Oracle: DuckDB recursive CTE computing the transitive closure over the same
line-adjacency edges (clusters here are small endpoint stars, so the closure
is tiny), then component = min reachable line id — an independent formulation
of the engine's label-propagation loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.networks import component_stats, connected_components
from ..sources.synthetic import oracle_cte, register_geo_views


def q_network_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_geo_views(spark, sf_dir)
    comp = connected_components(spark.table("geo_lines"))
    sizes = component_stats(comp)
    return comp.join(sizes, "component_id").select(
        "line_id", "component_id", "n_lines"
    )


from ..sources.synthetic import GEO_VIEWS

ORACLE_NETWORK_COMPONENTS = f"""
WITH RECURSIVE geo_lines AS ({GEO_VIEWS['geo_lines']}),
nodes AS (
  SELECT line_id,
         CAST(floor(x1 * 1000000.0) AS BIGINT) * 1000000000
         + CAST(floor(y1 * 1000000.0) AS BIGINT) AS node_key
  FROM geo_lines
  UNION ALL
  SELECT line_id,
         CAST(floor(x3 * 1000000.0) AS BIGINT) * 1000000000
         + CAST(floor(y3 * 1000000.0) AS BIGINT)
  FROM geo_lines
),
edges AS (
  SELECT DISTINCT l.line_id AS a, r.line_id AS b
  FROM nodes l JOIN nodes r ON l.node_key = r.node_key AND l.line_id <> r.line_id
),
reach AS (
  SELECT line_id AS a, line_id AS b FROM geo_lines
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS line_id, MIN(b) AS component_id FROM reach GROUP BY a
),
sizes AS (
  SELECT component_id, COUNT(*) AS n_lines FROM comp GROUP BY 1
)
SELECT c.line_id, c.component_id, s.n_lines
FROM comp c JOIN sizes s USING (component_id)
"""


QUERIES = {"geo_network_components": q_network_components}
ORACLES = {"geo_network_components": ORACLE_NETWORK_COMPONENTS}
