"""Property tests for the north-star dedup/similarity operators beyond the
oracle hash-match: planted-duplicate recovery, LSH recall floors, edge
shapes (short docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    simhash,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_cosine_topk,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import load_table


def test_exact_dedup_planted(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "A  b   c"), (3, "totally different"), (4, "a b c")],
        "doc_id long, text string",
    )
    out = {r["keep_id"]: r["n_docs"] for r in exact_dedup(df, "text", "doc_id").collect()}
    # normalization folds case+whitespace: docs 1,2,4 are one group keyed by min id
    assert out == {1: 3, 3: 1}


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely unrelated words about spark shuffles and parquet footers"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = minhash_near_duplicates(df, "doc_id", "text", threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard"] > 0.5


def test_minhash_exhaustive_vs_lsh_recall(spark, sf_dir):
    """LSH candidate pruning must not lose any >=0.8 pair that a full
    pairwise Jaccard over the documents table finds."""
    docs = load_table(spark, sf_dir, "documents")
    found = minhash_near_duplicates(docs, "doc_id", "text", threshold=0.8)
    # brute-force truth: explode distinct shingles, self-join, exact jaccard
    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.text import shingles, tokenize

    sh = docs.select(
        F.col("doc_id"), F.array_distinct(shingles(tokenize(F.col("text")), 3)).alias("s")
    )
    ex = sh.select("doc_id", F.explode("s").alias("g"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sizes = sh.select("doc_id", F.size("s").alias("n"))
    truth = (
        inter.join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
        .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
        .filter(F.col("i") / (F.col("n1") + F.col("n2") - F.col("i")) >= 0.8)
    )
    truth_pairs = {(r["d1"], r["d2"]) for r in truth.collect()}
    found_pairs = {(r["doc_a"], r["doc_b"]) for r in found.collect()}
    assert truth_pairs == found_pairs  # 16x4-band LSH at jac>=0.8: no misses expected


def test_simhash_near_dup_close_hamming(spark):
    base = " ".join(f"w{i}" for i in range(60))
    near = base.replace("w30", "zz")
    df = spark.createDataFrame([(1, base), (2, near)], "doc_id long, text string")
    out = {r["doc_id"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()}
    hamming = bin(out[1] ^ out[2]).count("1")
    assert hamming <= 6  # one token changed out of 60 -> few bit flips


def test_lsh_knn_recall_floor(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    brute = cosine_topk_bruteforce(emb, q, k=5).collect()
    approx = lsh_cosine_topk(emb, q, k=5).collect()
    bset = {(r["query_id"], r["neighbor_id"]) for r in brute}
    aset = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(bset & aset) / len(bset) >= 0.4  # floor on near-random vectors
