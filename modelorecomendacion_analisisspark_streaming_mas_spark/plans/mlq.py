"""ML query catalog (M1-M6). ALS factorization is seeded but its numeric
fixpoint is engine-specific (block partitioning, float order), so these are
rows-only entries; the numeric semantics are pinned by tests/test_recommend.py
(fold-in reproduces MLlib's ridge normal equations exactly at convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.recommend import (
    build_als,
    fold_in,
    item_factor_matrix,
    ratings_from_testdata,
)
from .catalog import register

# One ALS fit per (sf_dir) per process: m01/m02 share the trained model.
_MODELS: dict[str, object] = {}


def _fitted(spark: SparkSession, sf_dir: str):
    if sf_dir not in _MODELS:
        ratings = ratings_from_testdata(spark, sf_dir).cache()
        model = build_als(rank=8, max_iter=8).fit(ratings)
        # collect the factor matrix once: ALSModel.itemFactors re-derives
        # its lineage on every access, so repeated collects re-pay the cost
        ids, Y = item_factor_matrix(model)
        _MODELS[sf_dir] = (model, ratings, ids, Y)
    return _MODELS[sf_dir]


@register("m01_als_top5_recs", oracle=None)
def m01_als_top5_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1+M4: train on the derived ratings, top-5 recommendations for the
    20 most active users.

    DELIBERATE DIVERGENCE from the reference's model params: the catalog
    entry trains at rank=8/maxIter=8 (a BENCH shape -- the per-round
    bench would otherwise spend most of its budget inside one als.fit),
    while ``build_als`` defaults pin the reference's rank=20/maxIter=15/
    regParam=0.1 and tests/test_recommend.py trains at those exact
    params. COVERAGE.md M1 row states the same."""
    model, ratings, _ids, _Y = _fitted(spark, sf_dir)
    active = ratings.groupBy("userId").count().orderBy(F.desc("count"), "userId").limit(20)
    recs = model.recommendForUserSubset(active.select("userId"), 5)
    return recs.select(
        "userId",
        F.explode("recommendations").alias("rec"),
    ).select("userId", F.col("rec.itemId").alias("itemId"), F.round("rec.rating", 3).alias("score"))


@register("m02_cold_start_fold_in", oracle=None)
def m02_cold_start_fold_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: cold-start fold-in (app4/recommender.py:39-53) for a synthetic
    new user seeded with 5 ratings; returns the top-5 catalog scores."""
    model, _ratings, ids, Y = _fitted(spark, sf_dir)
    seed = [(int(ids[i]), float(1 + i % 5)) for i in range(5)]
    recs = fold_in(ids, Y, seed, top_n=5)
    return spark.createDataFrame(
        [(int(i), round(s, 3)) for i, s in recs], "itemId long, score double"
    )
