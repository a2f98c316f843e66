"""Similarity search over embedding columns (north-star surface):
brute-force cosine top-k baseline + random-hyperplane-LSH bucketed variant.

Scale shapes:

* ``cosine_topk_bruteforce``: the query side is REQUIRED to be small (it is
  broadcast); the candidate side streams. Cost is |Q| x |C| dot products of
  JVM-side higher-order-function arithmetic -- no Python, no shuffle except
  the final per-query top-k (grouped window over |Q| keys). This is the
  exactness baseline.
* ``lsh_cosine_topk``: random-hyperplane signatures bucket both sides; dot
  products only run within matching buckets, turning |Q| x |C| into
  sum over buckets |Q_b| x |C_b|. Recall is tested against the brute-force
  baseline in tests/test_similarity.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str, out: str = "norm") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn(out, F.sqrt(_dot(v, v)))


def cosine_topk_bruteforce(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of each query vector against all candidates.

    Output: (query_id, neighbor_id, cosine, rn) -- ranked on the raw
    cosine with neighbor_id tie-break, cosine rounded to 4 for stable
    cross-engine comparison.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_raw",
            _dot(F.col("qv"), F.col("cv"))
            / (F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 4).alias("cosine"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _signature(vec_col, planes: list[list[float]]):
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(vec_col, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: ``n_tables`` independent sign-LSH tables of
    ``n_planes`` hyperplanes; dot products only within shared buckets."""
    tables = [random_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        v = _as_double(F.col(vec_col))
        sig = F.array(*[F.struct(F.lit(t).alias("t"), _signature(v, tables[t]).alias("b")) for t in range(n_tables)])
        return df.select(
            F.col(id_col).alias(f"{side}_id"), v.alias(f"{side}_v"), F.explode(sig).alias("bk")
        ).select(f"{side}_id", f"{side}_v", "bk.t", "bk.b")

    qb = bucketed(queries, "q")
    cb = bucketed(candidates, "c")
    pairs = (
        cb.join(F.broadcast(qb), ["t", "b"])
        .filter(F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", "q_v", "c_v")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = pairs.withColumn(
        "cos_raw",
        _dot(F.col("q_v"), F.col("c_v"))
        / (F.sqrt(_dot(F.col("q_v"), F.col("q_v"))) * F.sqrt(_dot(F.col("c_v"), F.col("c_v")))),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_raw"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            F.round("cos_raw", 4).alias("cosine"),
            F.col("rn").cast("long").alias("rn"),
        )
    )
