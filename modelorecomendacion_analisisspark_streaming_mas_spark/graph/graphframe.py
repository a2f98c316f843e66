"""Drop-in ``GraphFrame`` adapter: the graphframes-library surface the
reference's notebooks use (GraphFrames_prueba/Explorativa3.ipynb:94-102,
372-376, 460 -- ``GraphFrame(v, e)``, ``.inDegrees``, ``.pageRank``,
``.connectedComponents``), re-expressed over this package's oracle-verified
DataFrame algorithms (graph/algorithms.py) so notebook code ports verbatim
WITHOUT the graphframes jar.

Design notes vs the library:

* No ``spark.sparkContext.setCheckpointDir`` needed -- the underlying
  algorithms ``localCheckpoint`` internally (the notebook's mandatory
  checkpoint-dir cell becomes a no-op).
* ``labelPropagation`` pins frequency ties (count DESC, label ASC);
  the library's tie-break follows hash-partition order and is
  nondeterministic run to run.
* ``connectedComponents`` labels each component with its smallest member
  id (the library's default algorithm does the same).
* Algorithms return plain DataFrames / GraphFrames exactly like the
  library: ``pageRank`` returns a GraphFrame whose vertices carry
  ``pagerank`` and whose edges carry ``weight``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .algorithms import (
    bfs_levels,
    connected_components,
    in_degrees,
    label_propagation,
    out_degrees,
    pagerank,
    pagerank_weighted,
    triangle_count,
)

ID = "id"
SRC = "src"
DST = "dst"


class GraphFrame:
    """``GraphFrame(v, e)``: v must have an ``id`` column; e must have
    ``src`` and ``dst`` columns. Extra columns on either side are carried
    through, matching the library's contract."""

    def __init__(self, v: DataFrame, e: DataFrame) -> None:
        if ID not in v.columns:
            raise ValueError(f"vertex DataFrame must have an '{ID}' column, got {v.columns}")
        missing = [c for c in (SRC, DST) if c not in e.columns]
        if missing:
            raise ValueError(f"edge DataFrame must have {missing} column(s), got {e.columns}")
        self._vertices = v
        self._edges = e

    # -- structure ---------------------------------------------------------

    @property
    def vertices(self) -> DataFrame:
        return self._vertices

    @property
    def edges(self) -> DataFrame:
        return self._edges

    def __repr__(self) -> str:
        v, e = self._vertices, self._edges
        return f"GraphFrame(v:[{', '.join(v.columns)}], e:[{', '.join(e.columns)}])"

    # -- degrees (vertices with zero degree are omitted, like the library) -

    @property
    def inDegrees(self) -> DataFrame:
        return in_degrees(self._edges)

    @property
    def outDegrees(self) -> DataFrame:
        return out_degrees(self._edges)

    @property
    def degrees(self) -> DataFrame:
        both = self._edges.select(F.col(SRC).alias(ID)).unionAll(
            self._edges.select(F.col(DST).alias(ID))
        )
        return both.groupBy(ID).agg(F.count(F.lit(1)).alias("degree"))

    # -- subgraph helpers --------------------------------------------------

    def filterVertices(self, condition) -> "GraphFrame":
        """Keep vertices matching ``condition``; edges restricted to the
        surviving endpoints (two semi-joins, no shuffle of attributes)."""
        v = self._vertices.filter(condition)
        ids = v.select(ID)
        e = (
            self._edges.join(ids.withColumnRenamed(ID, SRC), SRC, "left_semi")
            .join(ids.withColumnRenamed(ID, DST), DST, "left_semi")
        )
        return GraphFrame(v, e)

    def filterEdges(self, condition) -> "GraphFrame":
        return GraphFrame(self._vertices, self._edges.filter(condition))

    def dropIsolatedVertices(self) -> "GraphFrame":
        touched = (
            self._edges.select(F.col(SRC).alias(ID))
            .unionAll(self._edges.select(F.col(DST).alias(ID)))
            .distinct()
        )
        return GraphFrame(self._vertices.join(touched, ID, "left_semi"), self._edges)

    # -- algorithms --------------------------------------------------------

    def pageRank(
        self,
        resetProbability: float = 0.15,
        sourceId=None,
        maxIter: int | None = None,
        tol: float | None = None,
        weightCol: str | None = None,
    ) -> "GraphFrame":
        """Static PageRank (library semantics: rank = resetProbability +
        (1-resetProbability) * sum of neighbor contributions; ranks sum to
        ~|V|). Returns a GraphFrame whose vertices carry ``pagerank`` and
        whose edges carry ``weight`` (the src-normalized edge weight).

        ``weightCol`` is an extension the library lacks: contributions
        weighted by an edge column (see pagerank_weighted). ``tol`` /
        ``sourceId`` (until-convergence, personalized) are not provided --
        use a fixed ``maxIter``, which is what the reference notebook runs.
        """
        if maxIter is None:
            raise NotImplementedError(
                "pageRank: pass maxIter (tol-based convergence mode is not "
                "implemented; the reference runs maxIter=10)"
            )
        if sourceId is not None:
            raise NotImplementedError("personalized PageRank (sourceId) is not implemented")
        ids = self._vertices.select(ID)
        if weightCol is not None:
            ranks = pagerank_weighted(
                ids, self._edges, weight_col=weightCol,
                reset_prob=resetProbability, max_iter=maxIter,
            )
            wsrc = self._edges.groupBy(F.col(SRC).alias(ID)).agg(
                F.sum(weightCol).alias("_wsum")
            )
            e = (
                self._edges.join(wsrc, self._edges[SRC] == wsrc[ID])
                .drop(ID)
                .withColumn("weight", F.col(weightCol) / F.col("_wsum"))
                .drop("_wsum")
            )
        else:
            ranks = pagerank(
                ids, self._edges, reset_prob=resetProbability, max_iter=maxIter
            )
            od = out_degrees(self._edges)
            e = (
                self._edges.join(od, self._edges[SRC] == od[ID])
                .drop(ID)
                .withColumn("weight", F.lit(1.0) / F.col("outDegree"))
                .drop("outDegree")
            )
        v = self._vertices.join(ranks, ID, "left").withColumn(
            # dangling vertices never receive contributions: reset mass only
            "pagerank", F.coalesce(F.col("pagerank"), F.lit(resetProbability))
        )
        return GraphFrame(v, e)

    def connectedComponents(self, algorithm: str = "graphframes", **kw) -> DataFrame:
        """Undirected connected components; returns the vertex DataFrame
        plus a ``component`` column = smallest member id."""
        comp = connected_components(self._vertices.select(ID), self._edges, **kw)
        return self._vertices.join(comp, ID, "left").withColumn(
            # vertices absent from the edge set are their own component
            "component", F.coalesce(F.col("component"), F.col(ID))
        )

    def labelPropagation(self, maxIter: int) -> DataFrame:
        """Community detection; returns vertices plus a ``label`` column.
        Ties pinned (count DESC, label ASC) -- deterministic, unlike the
        library."""
        lab = label_propagation(self._vertices.select(ID), self._edges, max_iter=maxIter)
        return self._vertices.join(lab, ID, "left").withColumn(
            "label", F.coalesce(F.col("label"), F.col(ID))
        )

    def triangleCount(self) -> DataFrame:
        """Per-vertex triangle count over the undirected simple graph;
        returns vertices plus a ``count`` column (0 for triangle-free
        vertices, like the library)."""
        tri = triangle_count(self._edges).withColumnRenamed("v", ID)
        return self._vertices.join(tri, ID, "left").withColumn(
            "count", F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
        ).drop("n_triangles")

    def shortestPaths(self, landmarks: list) -> DataFrame:
        """Hop distances to each landmark (undirected, unweighted);
        returns vertices plus a ``distances`` map column keyed by
        landmark, omitting unreachable landmarks -- library semantics.
        One bounded BFS per landmark (landmark lists are small by
        contract)."""
        spark = self._vertices.sparkSession
        ids = self._vertices.select(ID)
        # bfs_levels early-exits on an empty frontier, so |V| is a safe
        # upper bound that never runs past the graph's diameter
        bound = int(ids.count())
        out = ids
        key_cols = []
        for lm in landmarks:
            seeds = spark.createDataFrame([(lm,)], [ID])
            lv = bfs_levels(ids, self._edges, seeds, max_iter=bound)
            out = out.join(lv.withColumnRenamed("level", f"_d_{lm}"), ID, "left")
            key_cols.append(lm)
        pairs = []
        for lm in key_cols:
            pairs.append(
                F.when(
                    F.col(f"_d_{lm}").isNotNull(),
                    F.struct(F.lit(lm).alias("k"), F.col(f"_d_{lm}").cast("int").alias("v")),
                )
            )
        dist = F.map_from_entries(
            F.filter(F.array(*pairs), lambda s: s.isNotNull())
        ).alias("distances")
        return self._vertices.join(
            out.select(ID, dist), ID, "left"
        )

    def find(self, pattern: str):
        raise NotImplementedError(
            "motif finding is not implemented; express the pattern as "
            "explicit DataFrame self-joins on the edges frame"
        )

    def bfs(self, fromExpr, toExpr, **kw):
        raise NotImplementedError(
            "path-materializing bfs is not implemented; use "
            "graph.algorithms.bfs_levels for hop distances"
        )
