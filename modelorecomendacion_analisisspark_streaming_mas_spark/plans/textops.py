"""North-star query catalog: dedup, text analysis, similarity search
(BASELINE.json extensions) over the documents/embeddings tables.

The MinHash/SimHash oracles are generated programmatically so the SQL
mirrors the exact same md5-based hash lattice the Spark operators use --
every stage (signature, banding, candidate pairs, exact Jaccard) is
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_LEXICONS,
    avg_token_length,
    distinct_token_count,
    doc_fingerprint,
    lang_id,
    token_count,
    tokenize,
)
from ..operators.dedup import minhash_near_duplicates, simhash
from ..operators.similarity import cosine_topk_bruteforce, lsh_cosine_topk
from ..sources.readers import load_table
from .catalog import grid_mean_spark, grid_mean_sql, register, shingle_rows_sql

# portable 32-bit md5 hash in DuckDB SQL
_DUCK_H32 = "(('0x'||substr(md5({expr}),1,8))::UBIGINT)::BIGINT"


# --------------------------------------------------------------------------
# d01: exact dedup by normalized-text fingerprint (north-star; reference
# analogue: dropDuplicates before ALS, Modelo/Crear modelo.ipynb:89).
# --------------------------------------------------------------------------


@register(
    "d01_exact_dedup_docs",
    oracle="""
WITH fp AS (
  SELECT source,
         ('0x'||substr(md5(lower(regexp_replace(trim(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))),1,15))::UBIGINT::BIGINT AS f
  FROM documents
)
SELECT source, count(*) AS n_docs, count(DISTINCT f) AS n_unique,
       count(*) - count(DISTINCT f) AS n_dup_docs
FROM fp GROUP BY source
""",
)
def d01_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("source", doc_fingerprint(F.col("text")).alias("f"))
    return fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("f").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("f")).alias("n_dup_docs"),
    )


# --------------------------------------------------------------------------
# d02: MinHash + LSH near-duplicate detection, exact-Jaccard verified.
# H=16 hashes, 4 bands x 4 rows, word-3-gram shingles, threshold 0.8.
# --------------------------------------------------------------------------

from ..operators.dedup import MINHASH_A, MINHASH_B, MINHASH_PRIME  # noqa: E402

_MINHASH_SIG_SQL = "[" + ", ".join(
    f"list_min([({MINHASH_A[i]}*h + {MINHASH_B[i]}) % {MINHASH_PRIME} for h in hb])"
    for i in range(16)
) + "]"

# CTE block shared with d07's clustering oracle (curation.py): everything up
# to the exact-verified pair set. Kept separate from the final SELECT so both
# oracles run the IDENTICAL hash lattice.
# per-ROW shingle lists via catalog.shingle_rows_sql (lead() windows; the
# slice comprehension is quadratic in doc length, r14 longstr find). `sh`
# keeps one row per PHYSICAL documents row (GROUP BY _rid) so duplicate doc
# rows (dupx) keep their multiplicity exactly as the old per-row
# list_distinct did; shingle order inside `s` is irrelevant downstream
# (min-hash folds, len(), list_filter/contains).
_D02_PAIR_CTES = f"""tok AS MATERIALIZED (
  SELECT row_number() OVER () AS _rid, doc_id, string_split(text, ' ') AS t
  FROM documents
), {shingle_rows_sql('tok', 3, 'doc_id')},
sh AS (
  SELECT doc_id, list(DISTINCT g) AS s FROM shw GROUP BY _rid, doc_id
), hb_t AS (
  SELECT doc_id, s, [{_DUCK_H32.format(expr='g')} for g in s] AS hb FROM sh
), sig AS (
  SELECT doc_id, s, {_MINHASH_SIG_SQL} AS sg FROM hb_t
), banded AS (
  SELECT doc_id, unnest([0,1,2,3]) AS band_idx, sg FROM sig
), keyed AS (
  SELECT doc_id, band_idx,
         array_to_string(sg[band_idx*4+1:band_idx*4+4], ',') AS band_key
  FROM banded
), cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keyed a JOIN keyed b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
), verified AS (
  SELECT c.doc_a, c.doc_b,
         round(len(list_filter(sa.s, x -> list_contains(sb.s, x)))::DOUBLE
               / len(list_distinct(sa.s || sb.s)), 4) AS jaccard
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b
)"""

_D02_ORACLE = f"""
WITH {_D02_PAIR_CTES}
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= 0.8
"""


@register("d02_minhash_near_dups", oracle=_D02_ORACLE)
def d02_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.8, num_hashes=16, bands=4, shingle_n=3
    )


# --------------------------------------------------------------------------
# d03: SimHash signatures (32-bit) per document.
# --------------------------------------------------------------------------

_SIMHASH_VOTES = ", ".join(
    f"sum(CASE WHEN (h & {1 << j}) > 0 THEN 1 ELSE -1 END) AS v{j}" for j in range(32)
)
_SIMHASH_COMBINE = " + ".join(f"(CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(32))

_D03_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token FROM documents
), h AS (
  SELECT doc_id, {_DUCK_H32.format(expr='token')} AS h FROM tok
), v AS (
  SELECT doc_id, {_SIMHASH_VOTES} FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({_SIMHASH_COMBINE} AS BIGINT) AS simhash FROM v
"""


@register("d03_simhash_docs", oracle=_D03_ORACLE)
def d03_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text", bits=32)


# --------------------------------------------------------------------------
# t01: per-language text-quality profile.
# --------------------------------------------------------------------------


@register(
    "t01_text_quality",
    oracle=f"""
WITH feat AS (
  SELECT lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) AS tok_len
  FROM documents
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT)                    AS total_tokens,
       {grid_mean_sql('n_tokens', 1, 4)}                AS avg_tokens,
       round(avg(n_distinct::DOUBLE / n_tokens), 6)     AS avg_distinct_ratio,
       round(avg(tok_len), 6)                           AS avg_token_len
FROM feat GROUP BY lang
""",
)
def t01_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select(
        "lang",
        token_count("text").alias("n_tokens"),
        distinct_token_count("text").alias("n_distinct"),
        avg_token_length("text").alias("tok_len"),
    )
    return feat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        # integer inputs -> integer-grid mean (r11, t14 lesson)
        grid_mean_spark("n_tokens", 1, 4).alias("avg_tokens"),
        F.round(F.avg(F.col("n_distinct") / F.col("n_tokens")), 6).alias("avg_distinct_ratio"),
        F.round(F.avg("tok_len"), 6).alias("avg_token_len"),
    )


# --------------------------------------------------------------------------
# t02: language-ID heuristic confusion matrix (stopword lexicons).
# --------------------------------------------------------------------------


def _duck_hits(lang: str) -> str:
    lex = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
    return f"len(list_filter(string_split(text, ' '), x -> x IN ({lex})))"


_T02_ORACLE = f"""
WITH hits AS (
  SELECT lang,
         {_duck_hits('en')} AS he, {_duck_hits('es')} AS hs,
         {_duck_hits('fr')} AS hf, {_duck_hits('de')} AS hd
  FROM documents
), pred AS (
  SELECT lang,
         CASE WHEN he > 0 AND he >= hs AND he >= hf AND he >= hd THEN 'en'
              WHEN hs > 0 AND hs >= hf AND hs >= hd THEN 'es'
              WHEN hf > 0 AND hf >= hd THEN 'fr'
              WHEN hd > 0 THEN 'de'
              ELSE 'unknown' END AS predicted
  FROM hits
)
SELECT lang, predicted, count(*) AS n FROM pred GROUP BY lang, predicted
"""


@register("t02_lang_id_confusion", oracle=_T02_ORACLE)
def t02_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_id("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# t03: token counting -- whitespace tokens + BPE-ish regex pieces.
# --------------------------------------------------------------------------


@register(
    "t03_token_stats",
    oracle=f"""
SELECT source, count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT)            AS sum_word_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS sum_alpha_pieces,
       {grid_mean_sql('n_chars', 1, 4)}               AS avg_chars
FROM documents GROUP BY source
""",
)
def t03_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("sum_word_tokens"),
        F.sum(F.regexp_count("text", F.lit("[a-z]+")).cast("long")).alias("sum_alpha_pieces"),
        # integer inputs -> integer-grid mean (r11, t14 lesson)
        grid_mean_spark("n_chars", 1, 4).alias("avg_chars"),
    )


# --------------------------------------------------------------------------
# e01: exact cosine top-5 (brute force baseline) for query vectors 0..9.
# --------------------------------------------------------------------------


@register(
    "e01_knn_bruteforce",
    oracle="""
WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 10),
     c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v)
           / (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
  FROM q, c WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rn
FROM scored QUALIFY rn <= 5
""",
)
def e01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_bruteforce(emb, emb.filter(F.col("vec_id") < 10), k=5)


# --------------------------------------------------------------------------
# e02: LSH-bucketed approximate cosine top-5 (the 100 TB scale path).
# Hash-exact oracle since r5: the hyperplanes are md5-derived +-1
# (Rademacher) and the signature dot products run in exact int64 on
# quantized vectors, so DuckDB rebuilds the IDENTICAL 8-table LSH
# structure from scratch -- buckets, candidate pairs, and the final
# cosine top-5 are all verified, not just row counts. Same pinning
# technique e03 uses for centroids and e04 for codebooks.
# --------------------------------------------------------------------------

# e dedupes to vector IDENTITIES (r13 dupx): duplicate rows would both
# pollute the signature sums (each plane counted x copies in the per-id
# GROUP BY) and re-inflate the candidate scoring joins after DISTINCT
# pairs. The engine dedupes its input the same way.
_E02_ORACLE = """
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         [CASE WHEN x >= 0 THEN floor(x * 1000.0 + 0.5)
               ELSE -floor(-x * 1000.0 + 0.5) END::BIGINT
          for x in embedding::DOUBLE[]] AS q
  FROM (SELECT DISTINCT vec_id, embedding FROM embeddings)
), planes AS (
  SELECT t, p,
         [CASE WHEN (('0x'||substr(md5('lshpl|'||t::VARCHAR||'|'||p::VARCHAR||'|'||d::VARCHAR),1,8))::UBIGINT)::BIGINT % 2 = 0
               THEN 1 ELSE -1 END for d in generate_series(0, 63)] AS w
  FROM unnest(generate_series(0, 7)) tt(t), unnest(generate_series(0, 3)) pp(p)
), sig AS (
  SELECT e.vec_id, pl.t,
         SUM(CASE WHEN list_sum(list_transform(generate_series(1, 64), i -> e.q[i] * pl.w[i])) >= 0
                  THEN (1 << pl.p) ELSE 0 END) AS b
  FROM e, planes pl
  GROUP BY e.vec_id, pl.t
), pairs AS (
  SELECT DISTINCT qs.vec_id AS query_id, cs.vec_id AS neighbor_id
  FROM sig qs JOIN sig cs ON qs.t = cs.t AND qs.b = cs.b
  WHERE qs.vec_id < 10 AND qs.vec_id <> cs.vec_id
), scored AS (
  SELECT p.query_id, p.neighbor_id,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos_raw
  FROM pairs p
  JOIN e a ON a.vec_id = p.query_id
  JOIN e b ON b.vec_id = p.neighbor_id
)
SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS BIGINT) AS rn
FROM scored QUALIFY rn <= 5
"""


@register("e02_knn_lsh", oracle=_E02_ORACLE)
def e02_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vector identities (see _E02_ORACLE comment)
    emb = load_table(spark, sf_dir, "embeddings").dropDuplicates(
        ["vec_id", "embedding"]
    )
    return lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


# --------------------------------------------------------------------------
# t04: TF-IDF top terms per language. Implemented directly in DataFrame ops
# (not ml.feature) so the exact formula -- tf = n/len, idf = ln((N+1)/(df+1))+1
# -- mirrors 1:1 into the oracle. Top-5 terms per lang by mean tf-idf.
# --------------------------------------------------------------------------


@register(
    "t04_tfidf_top_terms",
    oracle=f"""
WITH ws AS (
  -- split ONCE per doc; computing len(string_split(text)) alongside the
  -- unnest re-splits the raw string per TOKEN row -- O(len * tokens) per
  -- doc, found by the r13 longstr variant (t04 went 2.4s -> 450s at
  -- 64 KiB rows)
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
), tok AS (
  SELECT doc_id, lang, unnest(w) AS term, len(w) AS n_tokens
  FROM ws
), tf AS (
  SELECT doc_id, lang, term, n_tokens, count(*) AS n
  FROM tok GROUP BY doc_id, lang, term, n_tokens
), df_t AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
), n_docs AS (SELECT count(*) AS n FROM documents),
scored AS (
  -- per-doc tf-idf pre-rounded to 9dp, mean on the integer grid at 8dp
  -- (grid_mean): avg_tfidf is bit-identical across engines, so the
  -- rank's (value, term) tie-break fires identically -- a dup-heavy
  -- variant exposed two terms with mathematically EQUAL scores whose
  -- unrounded engine-order sums differed at one ulp, swapping rn 1/2
  SELECT tf.lang, tf.term,
         {grid_mean_sql("round((tf.n::DOUBLE / tf.n_tokens) * (ln((n_docs.n + 1.0) / (df_t.df + 1.0)) + 1.0), 9)", 1_000_000_000, 8)} AS avg_tfidf
  FROM tf JOIN df_t ON tf.term = df_t.term CROSS JOIN n_docs
  GROUP BY tf.lang, tf.term
)
SELECT lang, term, avg_tfidf AS tfidf,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY avg_tfidf DESC, term) AS BIGINT) AS rn
FROM scored
QUALIFY rn <= 5
""",
)
def t04_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # tokenize ONCE per doc and carry the materialized array through the
    # explode: a sibling size(tokenize(text)) expression is re-evaluated
    # per EXPLODED row -- O(doc_len * n_tokens) per doc, caught by the
    # r13 longstr variant (2.4s -> 450s at 64 KiB rows)
    base = docs.select("doc_id", "lang", tokenize("text").alias("ws")).withColumn(
        "n_tokens", F.size("ws")
    )
    tok = base.select("doc_id", "lang", F.explode("ws").alias("term"), "n_tokens")
    tf = tok.groupBy("doc_id", "lang", "term", "n_tokens").agg(F.count(F.lit(1)).alias("n"))
    df_t = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(df_t, "term")
        .withColumn(
            "tfidf_doc",
            # pre-rounded at 9dp so the grid mean below is exact (the
            # q62 device); the 8dp grid-mean aggregate is bit-identical
            # across engines, making the rank's (value, term) tie-break
            # deterministic -- a dup-heavy variant showed two terms with
            # mathematically equal scores swapping ranks on one-ulp
            # engine-order sum differences (r11)
            F.round(
                (F.col("n") / F.col("n_tokens"))
                * (F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0),
                9,
            ),
        )
        .groupBy("lang", "term")
        .agg(grid_mean_spark("tfidf_doc", 1_000_000_000, 8).alias("avg_tfidf"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("avg_tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "lang", "term", F.col("avg_tfidf").alias("tfidf"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


# --------------------------------------------------------------------------
# t08: bigram-LM cross-entropy scoring -- the perplexity-filter shape
# pretraining pipelines use for quality gating (score each doc under a
# corpus-trained n-gram model; outliers are boilerplate/garbled text).
# Model and scoring in one pass over the bigram relation: MLE
# P(w2|w1) = c(w1,w2) / c(w1·), both counts from the SAME corpus, so the
# whole computation is a deterministic function of the input and the
# DuckDB oracle matches exactly (ln of exact integer ratios).
#
# Scale shape: bigram extraction is arrays_zip over adjacent slices (no
# positional self-join); the count tables join back on (w1, w2) / (w1) --
# auto-broadcast at test scale, shuffle joins at corpus scale where the
# stopword-headed skew calls for the salted-join pattern (operators/
# skew.py). Per-doc then per-source averaging keeps the output dim-sized.
# --------------------------------------------------------------------------

_T08_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
), pos AS (
  SELECT doc_id, source, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
  FROM tok
), big AS (
  SELECT a.doc_id, a.source, a.w AS w1, b.w AS w2
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.w <> '' AND b.w <> ''
), c12 AS (
  SELECT w1, w2, count(*) AS n12 FROM big GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS n1 FROM big GROUP BY w1
), doc_x AS (
  -- per-bigram -ln pre-rounded to 9dp BEFORE the per-doc avg (the q62
  -- device, same hardening as q82/t10): the avg runs in engine-dependent
  -- partial-agg order and unquantized libm terms can flip a 6dp digit.
  SELECT big.doc_id, big.source,
         {grid_mean_sql('round(-ln(CAST(n12 AS DOUBLE) / n1), 9)', 1_000_000_000, 9)} AS doc_xent
  FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
  GROUP BY big.doc_id, big.source
)
SELECT source, {grid_mean_sql('doc_xent', 1_000_000_000, 6)} AS avg_xent,
       count(*) AS n_docs
FROM doc_x GROUP BY source
"""


@register(
    "t08_bigram_cross_entropy",
    oracle=_T08_ORACLE,
    doc="Per-source mean bigram cross-entropy under the corpus-trained "
    "MLE bigram model (perplexity-filter building block).",
)
def t08_bigram_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    n = F.size("ws")
    bigrams = F.arrays_zip(
        F.slice("ws", 1, n - 1).alias("w1"), F.slice(F.col("ws"), 2, n - 1).alias("w2")
    )
    big = (
        docs.select("doc_id", "source", F.explode(bigrams).alias("b"))
        .select("doc_id", "source", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    c12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    doc_x = (
        big.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id", "source")
        .agg(
            # per-doc mean on the 1e-9 grid, half-away (a <=5e-10
            # perturbation of the old unrounded mean) so the outer mean
            # runs over grid-aligned inputs (r11, t14 lesson)
            grid_mean_spark(
                F.round(-F.log(F.col("n12").cast("double") / F.col("n1")), 9),
                1_000_000_000,
                9,
            ).alias("doc_xent")
        )
    )
    return doc_x.groupBy("source").agg(
        grid_mean_spark("doc_xent", 1_000_000_000, 6).alias("avg_xent"),
        F.count(F.lit(1)).alias("n_docs"),
    )
