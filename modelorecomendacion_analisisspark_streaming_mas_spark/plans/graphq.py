"""Graph query catalog (G1-G4) over the customer->part bipartite graph.

g02's oracle is the full 10-iteration PageRank UNROLLED into SQL CTEs --
the DataFrame loop and the SQL recurrence compute the identical fixpoint
prefix, so even an iterative graph algorithm gets a hash-level oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph.algorithms import (
    bipartite_graph_encoded,
    connected_components,
    decode_vertex_id,
    in_degrees,
    pagerank,
)
from .catalog import register

_EDGES_SQL = """
edges AS (
  SELECT DISTINCT 'c' || o.o_custkey AS src, 'p' || l.l_partkey AS dst
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)"""


# --------------------------------------------------------------------------
# g01: in-degrees (G2) -- top-100 most-connected parts.
# --------------------------------------------------------------------------


@register(
    "g01_part_in_degrees",
    oracle=f"""
WITH {_EDGES_SQL}
SELECT dst AS id, count(*) AS inDegree
FROM edges GROUP BY dst
ORDER BY inDegree DESC, id
LIMIT 100
""",
)
def g01_part_in_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    # degrees aggregate on packed-long ids (cheap shuffle), decode to the
    # reference's prefixed strings only for ordering + presentation;
    # single-pass consumer -> no checkpoint materialization (one straight
    # pipeline scan -> broadcast join -> distinct -> agg -> topk)
    _, edges = bipartite_graph_encoded(spark, sf_dir, materialize=False)
    return (
        in_degrees(edges)
        .select(decode_vertex_id(F.col("id")).alias("id"), "inDegree")
        .orderBy(F.desc("inDegree"), F.asc("id"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# g02: PageRank (G3), reset 0.15, 10 iterations, GraphFrames semantics.
# --------------------------------------------------------------------------


def _pagerank_oracle(iters: int = 10) -> str:
    ctes = [
        _EDGES_SQL.strip(),
        """verts AS (
  SELECT src AS id FROM edges UNION SELECT dst FROM edges
)""",
        """deg AS (
  SELECT src, count(*) AS d FROM edges GROUP BY src
)""",
        """e AS (
  SELECT edges.src, edges.dst, deg.d FROM edges JOIN deg ON edges.src = deg.src
)""",
        "r0 AS (\n  SELECT id, 1.0 AS rank FROM verts\n)",
    ]
    for n in range(1, iters + 1):
        ctes.append(
            f"""r{n} AS (
  SELECT v.id, 0.15 + 0.85 * COALESCE(s.contrib, 0.0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst, sum(r.rank / e.d) AS contrib
    FROM e JOIN r{n - 1} r ON e.src = r.id GROUP BY e.dst
  ) s ON v.id = s.dst
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT id, round(rank, 6) AS pagerank
FROM r{iters}
ORDER BY rank DESC, id
LIMIT 100
"""
    )


@register("g02_pagerank_top100", oracle=_pagerank_oracle(10))
def g02_pagerank_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 10 join+agg rounds iterate on packed-long ids; decode happens once,
    # before the (rank, string-id) tie-break ordering the oracle pins
    vertices, edges = bipartite_graph_encoded(spark, sf_dir)
    pr = pagerank(vertices, edges, reset_prob=0.15, max_iter=10)
    return (
        pr.select(decode_vertex_id(F.col("id")).alias("id"), "pagerank")
        .orderBy(F.desc("pagerank"), F.asc("id"))
        .limit(100)
        .select("id", F.round("pagerank", 6).alias("pagerank"))
    )


# --------------------------------------------------------------------------
# g03: connected components (G4) -- component-size histogram (the
# reference's cells 16-17 shape). The histogram is invariant to label
# choice, so the oracle does not need Spark's packed-long labels: it
# unrolls min-label propagation WITH pointer jumping (label <- label of
# label) into SQL CTEs, the same O(log diameter) recurrence the DataFrame
# loop runs (graph/algorithms.py connected_components). `rounds` is a
# hard upper bound on the rounds either engine needs at any test SF;
# tests/test_graph.py pins oracle==Spark equality and the Spark side
# raises on non-convergence, so a diameter blow-up cannot silently
# diverge the two.
# --------------------------------------------------------------------------


def _cc_oracle(rounds: int = 12) -> str:
    # Every CTE below is referenced more than once per round; DuckDB
    # inlines plain CTEs, which would re-execute each level's predecessor
    # twice -- exponential in `rounds`. MATERIALIZED pins one execution
    # per level (the oracle is then linear in rounds, like the engine).
    ctes = [
        _EDGES_SQL.strip(),
        """sym AS MATERIALIZED (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
)""",
        """verts AS (
  SELECT DISTINCT src AS id FROM sym
)""",
        "l0 AS MATERIALIZED (\n  SELECT id, id AS lab FROM verts\n)",
    ]
    for n in range(1, rounds + 1):
        ctes.append(
            f"""p{n} AS MATERIALIZED (
  SELECT v.id, least(v.lab, COALESCE(m.mn, v.lab)) AS lab
  FROM l{n - 1} v LEFT JOIN (
    SELECT s.dst AS id, min(r.lab) AS mn
    FROM sym s JOIN l{n - 1} r ON s.src = r.id GROUP BY s.dst
  ) m ON v.id = m.id
)"""
        )
        # Pointer jump: labels are vertex ids, so re-resolve through the
        # freshly propagated table (path halving).
        ctes.append(
            f"""l{n} AS MATERIALIZED (
  SELECT a.id, b.lab FROM p{n} a JOIN p{n} b ON a.lab = b.id
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT size, count(*) AS n_components FROM (
  SELECT lab, count(*) AS size FROM l{rounds} GROUP BY lab
) GROUP BY size ORDER BY size
"""
    )


@register("g03_component_histogram", oracle=_cc_oracle(12))
def g03_component_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # component labels never leave the query (histogram of sizes), so the
    # packed-long graph needs no decode at all
    vertices, edges = bipartite_graph_encoded(spark, sf_dir)
    cc = connected_components(vertices, edges)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy("size").agg(F.count(F.lit(1)).alias("n_components")).orderBy("size")
