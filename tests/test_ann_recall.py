"""ANN recall audit: CORRECTNESS (the driver oracle) proves e02/e03/e04
compute exactly the structure they claim; these tests prove the
approximations are *good*, which is the property a 100 TB user cares
about.

Two regimes, because recall is a property of DATA as much as of the
index:

* Real corpus (sf0.01 embeddings = iid noise, documented in
  plans/northstar2.py e04 honesty note): every quantizer is bounded by
  the absence of structure, so the floors are the honest measured
  levels, asserted so a regression (e.g. a broken bucket join silently
  returning near-empty candidate sets) is caught.
* Planted clusters (30 clusters x 6 members, tight noise): brute-force
  top-5 of each member is exactly its 5 cluster-mates, and an index
  that works MUST recover them -- high floors here are meaningful.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import (
    load_table,
)

SF001 = "/root/testdata/sf0.01"


def _pairs(rows):
    return {(r["query_id"], r["neighbor_id"]) for r in rows}


def _recall(truth: set, got: set) -> float:
    return len(truth & got) / len(truth)


@pytest.fixture(scope="module")
def corpus_truth(spark):
    emb = load_table(spark, SF001, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    return _pairs(cosine_topk_bruteforce(emb, q, k=5).collect())


def test_recall_real_corpus_e02_lsh(spark, corpus_truth):
    emb = load_table(spark, SF001, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    got = _pairs(lsh_cosine_topk(emb, q, k=5).collect())
    # measured 0.68 on the r5 corpus; 0.5 floor leaves noise margin while
    # still catching a broken band join (which collapses recall to ~0)
    assert _recall(corpus_truth, got) >= 0.5


def test_recall_real_corpus_e03_ivf(spark, corpus_truth):
    emb = load_table(spark, SF001, "embeddings")
    got = _pairs(
        ivf_cosine_topk(emb, k=5, nprobe=2, query_pred=lambda v: v < 10).collect()
    )
    # nprobe=2 of ~14 lists on structureless data probes ~15% of the
    # corpus; measured 0.38. The floor asserts the probed lists are the
    # RIGHT lists (random lists would give ~0.15).
    assert _recall(corpus_truth, got) >= 0.25


@pytest.fixture(scope="module")
def planted(spark):
    """30 clusters x 6 members: center c is a unit-ish Gaussian vector,
    members are center + N(0, 0.01) noise, so within-cluster cosine is
    ~0.999 and cross-cluster ~0. vec_ids are assigned round-robin-free
    (cluster-major) so the pinned docks (vec_id % 37 / % 53) land inside
    ordinary clusters -- no alignment between docks and structure."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((30, 64))
    rows = []
    vid = 0
    labels = {}
    for c in range(30):
        for _ in range(6):
            v = centers[c] + 0.01 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            labels[vid] = c
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, labels


def test_recall_planted_bruteforce_is_clustermates(spark, planted):
    """Sanity: with 6-member clusters and k=5, exact top-5 IS the mate
    set -- the ground truth the ANN tests below rely on."""
    df, labels = planted
    truth = _pairs(cosine_topk_bruteforce(df, df, k=5).collect())
    same = sum(1 for q, n in truth if labels[q] == labels[n])
    assert same / len(truth) >= 0.99


def test_recall_planted_e02_lsh(spark, planted):
    df, labels = planted
    truth = _pairs(cosine_topk_bruteforce(df, df, k=5).collect())
    got = _pairs(lsh_cosine_topk(df, df, k=5).collect())
    # near-identical vectors collide in >=1 of 8 tables w.h.p.
    assert _recall(truth, got) >= 0.9


def test_recall_planted_e03_ivf(spark, planted):
    df, labels = planted
    truth = _pairs(cosine_topk_bruteforce(df, df, k=5).collect())
    got = _pairs(ivf_cosine_topk(df, k=5, nprobe=2).collect())
    # cluster-mates share (modulo boundary noise) the same nearest dock,
    # so the query's own list contains its mates
    assert _recall(truth, got) >= 0.9


def test_recall_planted_e04_pq(spark, planted):
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.northstar2 import (
        pq_adc_topk,
    )

    df, labels = planted
    truth = _pairs(cosine_topk_bruteforce(df, df, k=5).collect())
    got = _pairs(pq_adc_topk(df, query_pred=None, k=5).collect())
    # mates encode to identical codes; ADC(q, mate) = q's own quantization
    # error, strictly below any other code cell except exact code
    # collisions between clusters (expected ~1.7 of 30x29/2 pairs at 256
    # cells) -- hence a floor below 1.0
    assert _recall(truth, got) >= 0.8


def test_recall_real_corpus_e05_truncated_rerank(spark, corpus_truth):
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch7 import (
        truncated_rerank_topk,
    )

    emb = load_table(spark, SF001, "embeddings")
    got = _pairs(
        truncated_rerank_topk(emb, emb.filter(F.col("vec_id") < 10)).collect()
    )
    # a 16-dim prefix of iid-noise 64-dim vectors explains 1/4 of the
    # cosine variance; measured 0.38 -- floor catches a broken rerank
    assert _recall(corpus_truth, got) >= 0.25


def test_recall_planted_e05_truncated_rerank(spark, planted):
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch7 import (
        truncated_rerank_topk,
    )

    df, labels = planted
    truth = _pairs(cosine_topk_bruteforce(df, df, k=5).collect())
    got = _pairs(truncated_rerank_topk(df, df).collect())
    # cluster-mates stay near-identical in ANY prefix, so pass 1 keeps
    # them all and the exact rerank restores the full top-5
    assert _recall(truth, got) >= 0.95


def test_recall_planted_e06_ivfpq(spark, planted):
    """IVF routing + PQ codes compose: mates share both the coarse list
    and the PQ codes, so the probed-list ADC ranking recovers them."""
    import importlib

    batch_mod = importlib.import_module(
        "modelorecomendacion_analisisspark_streaming_mas_spark.plans.northstar2"
    )
    df, labels = planted
    truth = _pairs(cosine_topk_bruteforce(df, df, k=5).collect())
    # run the e06 pipeline shape over the planted frame via its pieces:
    # reuse the registered callable against a temp view is not possible
    # (it loads from sf_dir), so mirror the plan inline
    from pyspark.sql import Window

    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.similarity import (
        _as_double,
        _dot,
    )

    e = df.select("vec_id", _as_double(F.col("embedding")).alias("v")).withColumn(
        "vn", F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    cent = e.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("ccid"), F.col("v").alias("cv"), F.col("vn").alias("cvn")
    )
    scored = e.crossJoin(F.broadcast(cent)).withColumn(
        "cc", _dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cvn"))
    )
    wc = Window.partitionBy("vec_id").orderBy(F.desc("cc"), F.asc("ccid"))
    ranked = scored.withColumn("crn", F.row_number().over(wc))
    lists = ranked.filter(F.col("crn") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "ccid"
    )
    probes = ranked.filter(F.col("crn") <= 2).select(
        F.col("vec_id").alias("query_id"), "ccid"
    )
    cand = (
        probes.join(lists, "ccid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    e2 = df.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    codes = batch_mod.pq_codes(e2).withColumnRenamed("vec_id", "neighbor_id")
    sub_e = batch_mod.pq_subvectors(e2)
    sub_cb = sub_e.filter(F.col("vec_id") % 53 == 0).select(
        "m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    qd = (
        sub_e.join(F.broadcast(sub_cb), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            "m",
            "cid",
            batch_mod._pq_sub_l2(F.col("sv"), F.col("cv")).alias("pd"),
        )
    )
    approx = (
        cand.join(codes, "neighbor_id")
        .join(qd, ["query_id", "m", "cid"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("pd").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    got = _pairs(
        approx.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
        .collect()
    )
    # composition floor: IVF keeps mates in the probed lists and PQ code
    # identity keeps ADC(q, mate) minimal -- below e04's solo floor only
    # by coarse-routing boundary noise
    assert _recall(truth, got) >= 0.75


def test_recall_real_corpus_e07_filtered(spark):
    """Filtered ANN vs filtered brute force: ground truth is the top-5
    among label-matching candidates only. e07 probes nprobe=2 lists, so
    its recall floor mirrors e03's unfiltered level -- the predicate
    must not degrade routing."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch7 import (
        _E07_LABEL,
        e07_knn_filtered,
    )

    emb = load_table(spark, SF001, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    truth = _pairs(
        cosine_topk_bruteforce(
            emb.filter(F.col("label") == _E07_LABEL), q, k=5
        ).collect()
    )
    got = _pairs(e07_knn_filtered(spark, SF001).collect())
    assert _recall(truth, got) >= 0.2  # e03's unfiltered measured level ~0.38


def test_e08_mmr_actually_diversifies(spark):
    """e08's CORRECTNESS oracle proves the greedy recurrence; this proves
    the PROPERTY: the MMR-selected 5 must have strictly lower mean
    pairwise similarity than the pure relevance top-5 for at least one
    query, and never higher on average across queries (otherwise the
    diversification term did nothing)."""
    import numpy as np

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf, "embeddings").collect()
    }

    def mean_pair_sim(ids):
        vs = [emb[i] / np.linalg.norm(emb[i]) for i in ids]
        sims = [float(vs[i] @ vs[j]) for i in range(len(vs)) for j in range(i + 1, len(vs))]
        return sum(sims) / len(sims)

    mmr_rows = REGISTRY["e08_mmr_diversified"].fn(spark, sf).collect()
    top_rows = cosine_topk_bruteforce(
        load_table(spark, sf, "embeddings"),
        load_table(spark, sf, "embeddings").filter(F.col("vec_id") < 5),
        k=5,
    ).collect()
    mmr_sel, top_sel = {}, {}
    for r in mmr_rows:
        mmr_sel.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for r in top_rows:
        top_sel.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(mmr_sel) == set(top_sel) and all(len(v) == 5 for v in mmr_sel.values())
    deltas = [mean_pair_sim(top_sel[q]) - mean_pair_sim(mmr_sel[q]) for q in mmr_sel]
    assert sum(deltas) / len(deltas) >= 0  # no net de-diversification
    assert max(deltas) > 0  # at least one query got measurably more diverse


def test_sq8_codes_and_reconstruction_bounds(spark):
    """SQ8 invariants: every dequantized value must sit inside its
    dimension's [min, max] band and within one quantization step
    (width/255) of the original -- the property that makes the 4x
    memory cut safe to rank with."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.similarity import (
        _as_double,
    )
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch9 import (
        sq8_dequantized,
    )

    e = (
        load_table(spark, SF001, "embeddings")
        .select("vec_id", _as_double(F.col("embedding")).alias("v"))
    )
    out = sq8_dequantized(e)
    # max |x - dv| per row, then global max, vs the max step width
    err = out.select(
        F.aggregate(
            F.zip_with("v", "dv", lambda x, y: F.abs(x - y)),
            F.lit(0.0),
            lambda acc, d: F.greatest(acc, d),
        ).alias("max_err")
    ).agg(F.max("max_err").alias("worst")).collect()[0]["worst"]
    stats = e.select(F.explode("v").alias("x")).agg(
        (F.max("x") - F.min("x")).alias("span")
    ).collect()[0]["span"]
    # per-dim width <= global span; one step = width/255 <= span/255,
    # allow 2 steps of slack for the clip at the band edges
    assert err <= 2 * stats / 255, (err, stats)


def test_sq8_ranking_close_to_bruteforce(spark, corpus_truth):
    """SQ8 keeps far more of the true top-5 than chance even on the
    structureless corpus -- 8-bit scalar codes are a much finer
    approximation than PQ's 10-centroid codebooks."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch9 import (
        e11_knn_sq8,
    )

    got = _pairs(e11_knn_sq8(spark, SF001).collect())
    assert _recall(corpus_truth, got) >= 0.9


def test_recall_planted_e13_nsw_beam(spark, planted):
    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.similarity import (
        nsw_beam_topk,
    )

    df, labels = planted
    truth = _pairs(cosine_topk_bruteforce(df, df, k=5).collect())
    got = _pairs(nsw_beam_topk(df, k=5).collect())
    # entry hubs + hub descent land the beam in the query's home list by
    # round 1; short-range edges then hold the mates (measured 1.0). The
    # hub edges are load-bearing: without them the beam stays trapped in
    # the entry centroid's cluster and recall collapses to ~0.17.
    assert _recall(truth, got) >= 0.9


def test_recall_real_corpus_e13_nsw_beam(spark, corpus_truth):
    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.similarity import (
        nsw_beam_topk,
    )

    emb = load_table(spark, SF001, "embeddings")
    got = _pairs(nsw_beam_topk(emb, k=5, query_pred=lambda v: v < 10).collect())
    # measured 0.48 on the structureless r7 corpus -- above IVF nprobe=2
    # (0.38) because the beam escapes the probed lists via hub hops; the
    # 0.3 floor catches a navigation regression without binding to noise
    assert _recall(corpus_truth, got) >= 0.3
