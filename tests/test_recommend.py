"""ALS module tests (M1-M6): training quality, persistence round-trip,
fold-in agreement with ALSModel.transform, distributed fold-in twin."""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.ml.recommend import (
    build_als,
    fold_in,
    fold_in_batch,
    item_factor_matrix,
    ratings_from_testdata,
    train_eval,
)


@pytest.fixture(scope="module")
def ratings(spark, sf_dir):
    return ratings_from_testdata(spark, sf_dir).cache()


@pytest.fixture(scope="module")
def model_rmse(ratings):
    # smaller rank/iters than the reference config to keep tests quick;
    # the reference config itself is exercised in bench/entry paths
    return train_eval(ratings, rank=8, max_iter=8)


def test_als_trains_and_beats_constant_predictor(ratings, model_rmse):
    model, rmse = model_rmse
    # constant-mean predictor RMSE == stddev of ratings; ALS must beat it
    stats = ratings.agg(F.stddev("rating").alias("sd")).collect()[0]
    assert 0 < rmse < stats["sd"] * 1.05
    assert model.rank == 8


def test_recommend_for_all_users(model_rmse):
    model, _ = model_rmse
    recs = model.recommendForAllUsers(5)
    row = recs.first()
    assert len(row["recommendations"]) == 5
    assert recs.count() > 0


def test_model_persistence_roundtrip(model_rmse, spark):
    from pyspark.ml.recommendation import ALSModel

    model, _ = model_rmse
    path = tempfile.mkdtemp(prefix="mras_als_") + "/model"
    model.write().overwrite().save(path)
    loaded = ALSModel.load(path)
    assert loaded.rank == model.rank
    assert loaded.itemFactors.count() == model.itemFactors.count()


def test_fold_in_agrees_with_transform(model_rmse, ratings, spark):
    """A user vector refit from the user's OWN ratings should rank items
    similarly to the trained model's predictions for that user."""
    model, _ = model_rmse
    ids, Y = item_factor_matrix(model)
    user = ratings.groupBy("userId").count().orderBy(F.desc("count")).first()["userId"]
    seed = [
        (r["itemId"], float(r["rating"]))
        for r in ratings.filter(F.col("userId") == user).collect()
    ]
    folded = fold_in(ids, Y, seed, top_n=len(ids), exclude_rated=False)
    folded_scores = dict(folded)

    cand = spark.createDataFrame([(user, int(i)) for i in ids], "userId int, itemId int")
    preds = {r["itemId"]: r["prediction"] for r in model.transform(cand).collect()}
    common = sorted(set(folded_scores) & set(preds))
    a = np.array([folded_scores[i] for i in common])
    b = np.array([preds[i] for i in common])
    # MLlib trains the user vector with NNLS, the serving fold-in is an
    # unconstrained ridge (app4/recommender.py:39-46): exact factors differ
    # (this is the reference's own serving-vs-training gap), but the induced
    # scores must still agree
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.7, corr


def test_fold_in_exact_on_unconstrained_model(ratings, spark):
    """With nonnegative=False both sides solve the same ridge problem, so
    fold-in must reproduce the model's own scores almost exactly."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.ml.recommend import build_als

    train = ratings
    # high iteration count so the stored user factors sit at the alternating
    # fixed point (a half-converged model's user factors lag the final item
    # factors by one half-step and fold-in agreement degrades)
    model = build_als(rank=8, max_iter=25, seed=42)
    model.setNonnegative(False)
    fitted = model.fit(train)
    ids, Y = item_factor_matrix(fitted)
    user = train.groupBy("userId").count().orderBy(F.desc("count")).first()["userId"]
    seed = [
        (r["itemId"], float(r["rating"]))
        for r in train.filter(F.col("userId") == user).collect()
    ]
    folded = dict(fold_in(ids, Y, seed, top_n=len(ids), exclude_rated=False))
    cand = spark.createDataFrame([(user, int(i)) for i in ids], "userId int, itemId int")
    preds = {r["itemId"]: r["prediction"] for r in fitted.transform(cand).collect()}
    common = sorted(set(folded) & set(preds))
    a = np.array([folded[i] for i in common])
    b = np.array([preds[i] for i in common])
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


def test_fold_in_batch_matches_numpy(model_rmse, spark):
    model, _ = model_rmse
    ids, Y = item_factor_matrix(model)
    seed = [(int(ids[0]), 5.0), (int(ids[1]), 3.0), (int(ids[2]), 1.0)]
    seed_df = spark.createDataFrame(
        [(9999, i, r) for i, r in seed], "userId int, itemId int, rating float"
    )
    out = fold_in_batch(model, seed_df).collect()
    assert len(out) == 1
    u_dist = np.array(out[0]["features"])

    rated = np.array([i for i, _ in seed])
    mask = np.isin(ids, rated)
    Yr = Y[mask]
    r_order = np.array([dict(seed)[i] for i in ids[mask]])
    A = Yr.T @ Yr + 0.1 * len(seed) * np.eye(model.rank)
    u_np = np.linalg.solve(A, Yr.T @ r_order)
    np.testing.assert_allclose(u_dist, u_np, rtol=1e-8)


def test_fold_in_empty_seed(model_rmse):
    model, _ = model_rmse
    ids, Y = item_factor_matrix(model)
    assert fold_in(ids, Y, [(999999999, 5.0)]) == []


def test_tune_als_grid(ratings):
    """M5: TrainValidationSplit grid search (reference grid shape,
    Crear modelo.ipynb:584-610) -- tiny grid to keep the suite fast."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.ml.recommend import tune_als

    best, results = tune_als(ratings, ranks=[4, 8], regs=[0.1], iters=[5])
    assert len(results) == 2
    assert all(m > 0 for _, m in results)
    best_rank = min(results, key=lambda r: r[1])[0]["rank"]
    assert best.rank == best_rank


def test_reference_params_train_eval(ratings):
    """M1 at the reference's EXACT model params (rank=20, maxIter=15,
    regParam=0.1 -- build_als defaults): trains, converges, and scores a
    sane RMSE on the held-out split. The catalog's m01 entry deliberately
    uses a smaller bench shape (see plans/mlq.py); this test is the row
    that pins true reference-param parity."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.ml.recommend import (
        build_als,
        train_eval,
    )

    als = build_als()
    assert (als.getRank(), als.getMaxIter(), als.getRegParam()) == (20, 15, 0.1)
    _model, rmse = train_eval(ratings)
    assert 0.0 < rmse < 2.0, rmse


def test_implicit_als_prefers_interacted_items(spark, sf_dir):
    """Implicit-feedback acceptance: predicted preference for observed
    (user, item) pairs must exceed preference for never-interacted pairs
    on average -- the property the confidence weighting exists to
    deliver."""
    from pyspark.sql import functions as F

    from modelorecomendacion_analisisspark_streaming_mas_spark.ml.recommend import (
        build_implicit_als,
        implicit_interactions,
    )

    inter = implicit_interactions(spark, sf_dir).cache()
    model = build_implicit_als().fit(inter)

    pos = model.transform(inter)
    # Non-interacted pairs: shift each user's items by a large offset mod
    # the item universe -- deterministic, overwhelmingly unobserved.
    items = [r[0] for r in inter.select("itemId").distinct().collect()]
    span = max(items) + 1
    neg = (
        inter.select("userId", ((F.col("itemId") + span // 2) % span).alias("itemId"))
        .join(inter, ["userId", "itemId"], "left_anti")
    )
    neg_scored = model.transform(neg.withColumn("rating", F.lit(0.0)))
    mean_pos = pos.agg(F.avg("prediction")).first()[0]
    mean_neg = neg_scored.agg(F.avg("prediction")).first()[0]
    assert mean_pos is not None and mean_neg is not None
    assert mean_pos > mean_neg + 0.05, (mean_pos, mean_neg)


def test_model_cache_scoped_per_context_and_resettable(spark, sf_dir):
    """The m01/m02 model cache must key on (applicationId, sf_dir) -- a
    different SparkContext can never be served another context's fit
    (VERDICT r3 watch-item) -- and expose an explicit reset hook."""
    from types import SimpleNamespace

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import mlq

    a = SimpleNamespace(sparkContext=SimpleNamespace(applicationId="app-A"))
    b = SimpleNamespace(sparkContext=SimpleNamespace(applicationId="app-B"))
    assert mlq._model_key(a, "/d") != mlq._model_key(b, "/d")
    assert mlq._model_key(a, "/d") == ("app-A", "/d")

    saved = dict(mlq._MODELS)
    try:
        mlq._MODELS.clear()
        mlq._MODELS[mlq._model_key(a, "/d")] = "fit-A"
        mlq._MODELS[mlq._model_key(b, "/d")] = "fit-B"
        mlq.reset_model_cache(a)  # only context A's entries drop
        assert list(mlq._MODELS.values()) == ["fit-B"]
        mlq.reset_model_cache()  # full reset
        assert not mlq._MODELS
    finally:
        mlq._MODELS.clear()
        mlq._MODELS.update(saved)


def test_item_factor_collect_guard(model_rmse, monkeypatch):
    """item_factor_matrix collects itemFactors to the driver; past the
    ceiling it must refuse with a pointer at fold_in_batch instead of
    OOMing. The ceiling is monkeypatched below the fixture model's
    catalog size to exercise the refusal cheaply."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.ml import recommend as R

    model, _ = model_rmse
    monkeypatch.setattr(R, "ITEM_FACTOR_COLLECT_LIMIT", 1)
    with pytest.raises(ValueError, match="fold_in_batch"):
        R.item_factor_matrix(model)


def test_m02_self_validation_catches_broken_fold_in(spark, sf_dir):
    """r14 VERDICT #3: the ALS entries are self-validating. m02 computes
    fold-in-vs-transform rank correlation in-query and RAISES below 0.7,
    so a deliberately broken fold-in (permuted factor rows -- scores no
    longer track the model) fails the catalog entry outright instead of
    sailing through the rows>0 check."""
    import numpy as np
    import pytest

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import mlq

    model, ratings, ids, Y = mlq._fitted(spark, sf_dir)
    # healthy parity first: the real factors correlate
    corr = mlq._fold_in_parity_corr(model, ratings, ids, Y)
    assert corr is None or corr > 0.7, corr

    # permute the factor rows: item ids no longer match their factors
    rng = np.random.RandomState(7)
    Y_broken = Y[rng.permutation(len(Y))]
    broken_corr = mlq._fold_in_parity_corr(model, ratings, ids, Y_broken)
    assert broken_corr is not None and broken_corr <= 0.7, broken_corr

    # and end-to-end: m02 with the broken factors cached raises
    key = mlq._model_key(spark, sf_dir)
    orig = mlq._MODELS[key]
    try:
        mlq._MODELS[key] = (model, ratings, ids, Y_broken)
        with pytest.raises(AssertionError, match="m02 self-validation"):
            mlq.m02_cold_start_fold_in(spark, sf_dir)
    finally:
        mlq._MODELS[key] = orig


def test_als_family_emits_validation_columns(spark, sf_dir):
    """Every ALS rows-only entry now carries its acceptance metric in the
    output schema, so the driver's rows-only record is self-describing:
    rows > 0 AND the rows say the check passed."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import mlq

    m01 = mlq.m01_als_top5_recs(spark, sf_dir)
    assert {"train_rmse", "baseline_rmse", "rmse_ok"} <= set(m01.columns)
    rows = m01.select("rmse_ok").distinct().collect()
    assert rows and all(r["rmse_ok"] for r in rows)

    m02 = mlq.m02_cold_start_fold_in(spark, sf_dir)
    assert {"fold_in_corr", "parity_ok"} <= set(m02.columns)
    assert all(r["parity_ok"] for r in m02.select("parity_ok").distinct().collect())

    m05 = mlq.m05_implicit_als_recs(spark, sf_dir)
    assert {"mean_pos", "mean_neg", "pref_ok"} <= set(m05.columns)
    assert all(r["pref_ok"] for r in m05.select("pref_ok").distinct().collect())
