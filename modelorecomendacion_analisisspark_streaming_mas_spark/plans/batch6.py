"""Round-4 additions: web-curation and retrieval primitives over the
``documents`` table.

Operators a 100 TB pretraining-data pipeline runs constantly, each
expressed as a declarative DataFrame plan with an exact DuckDB oracle:

  * q61 source-level quality gating (the C4/RefinedWeb "drop bad domains"
    step: aggregate doc-level quality per source, gate sources, keep docs);
  * q62 BM25 top-k retrieval (the decontamination / eval-search primitive;
    inverted-index shape: only docs containing a query term are scored);
  * q63 deterministic epoch shuffle + round-robin sharding (the "shuffle
    the corpus identically on every rerun" step before sequence packing);
  * q64 vocabulary coverage curve (tokenizer-planning: what fraction of
    corpus tokens the top-k vocabulary entries cover);
  * q65 distributed Bloom runtime filter (build = aggregate, probe =
    broadcast bit-ops; the oracle-checkable twin of Spark's runtime
    row-level join pruning);
  * q66 interval-overlap join via bounded bin explode (the scale-safe
    rewrite of an inequality join Spark would nested-loop);
  * q67 Count-Min sketch heavy hitters (mergeable-by-construction
    partial-agg build; est >= true audited per probe);
  * q68 windowed funnel analysis (JVM higher-order-aggregate state
    machine; the streaming twin is s21);
  * q69 retention cohort matrix;
  * q71 KMV distinct sketches with set algebra (union/intersection
    estimates vs exacts, oracle-exact unlike HLL).

Capability parity: the reference's ETL notebooks stop at per-column
cleaning (reference ``proyecto/limpieza*.ipynb``); these queries are the
corpus-level analogues its pipeline would need at scale, built on the
same tokenize/aggregate/window machinery as t01-t08.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import money_sum_spark, register

# --------------------------------------------------------------------------
# q61: source-level quality gate. Doc-level quality (distinct-token ratio)
# -> per-source mean -> sources passing a threshold -> keep only their
# docs. Scale shape: the per-source aggregate is |sources| rows (tiny),
# broadcast back as a semi-join filter -- the corpus is scanned twice but
# never shuffled on doc_id; both aggregations are partial-agg friendly.
# The gate value is rounded on both sides before the >= comparison so a
# float summation-order difference can never flip a source's verdict.
# --------------------------------------------------------------------------

_Q61_THRESHOLD = 0.50

_Q61_ORACLE = f"""
WITH doc_q AS (
  SELECT doc_id, source, lang, n_chars,
         len(list_distinct(string_split(text, ' ')))::DOUBLE
           / len(string_split(text, ' ')) AS ratio
  FROM documents
), src AS (
  SELECT source, round(avg(ratio), 6) AS src_avg_ratio
  FROM doc_q GROUP BY source
  HAVING round(avg(ratio), 6) >= {_Q61_THRESHOLD}
)
SELECT d.source, d.lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
       any_value(s.src_avg_ratio) AS src_avg_ratio
FROM doc_q d JOIN src s ON d.source = s.source
GROUP BY d.source, d.lang
"""


@register(
    "q61_source_quality_gate",
    oracle=_Q61_ORACLE,
    doc="Domain/source-level quality gating: per-source mean distinct-token "
    "ratio, keep sources >= 0.50, report kept docs per (source, lang). "
    "Broadcast gate, no corpus shuffle.",
)
def q61_source_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    doc_q = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ratio"),
    )
    src = (
        doc_q.groupBy("source")
        .agg(F.round(F.avg("ratio"), 6).alias("src_avg_ratio"))
        .filter(F.col("src_avg_ratio") >= _Q61_THRESHOLD)
    )
    return (
        doc_q.join(F.broadcast(src), "source")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.any_value("src_avg_ratio").alias("src_avg_ratio"),
        )
    )


# --------------------------------------------------------------------------
# q62: BM25 top-k retrieval (Okapi, k1=1.2 b=0.75). The corpus-search
# primitive behind eval-set decontamination and dataset search. Scale
# shape: docs NOT containing any query term are dropped with a JVM-side
# arrays_overlap filter BEFORE the explode (the inverted-index probe); df
# and the per-doc term frequencies come from the surviving rows only; the
# 3-row df table is broadcast; final top-k is a TakeOrdered, never a full
# sort. Per-term contributions are rounded at 9dp before the per-doc sum
# and the sum again at 6dp so partial-agg order cannot flip the hash.
# --------------------------------------------------------------------------

_Q62_TERMS = ("spark", "window", "sort")
_Q62_K1 = 1.2
_Q62_B = 0.75
_Q62_TOPK = 50

_Q62_TERMS_SQL = ", ".join(f"'{t}'" for t in _Q62_TERMS)

_Q62_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), stats AS (
  SELECT count(*) AS n_docs, avg(len(ws)) AS avgdl FROM base
), tok AS (
  SELECT doc_id, len(ws) AS dl, unnest(ws) AS term
  FROM base WHERE list_has_any(ws, [{_Q62_TERMS_SQL}])
), tf AS (
  SELECT doc_id, term, dl, count(*) AS tf
  FROM tok WHERE term IN ({_Q62_TERMS_SQL})
  GROUP BY doc_id, term, dl
), df_t AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), contrib AS (
  SELECT tf.doc_id,
         round(
           ln(1.0 + (stats.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))
           * (tf.tf * ({_Q62_K1} + 1.0))
           / (tf.tf + {_Q62_K1} * (1.0 - {_Q62_B} + {_Q62_B} * tf.dl / stats.avgdl)),
           9) AS c
  FROM tf JOIN df_t ON tf.term = df_t.term CROSS JOIN stats
)
, lexs AS (
  SELECT doc_id, sum(CAST(round(c * 1000000000) AS BIGINT)) AS s
  FROM contrib GROUP BY doc_id
)
SELECT doc_id,
       (CASE WHEN s >= 0 THEN floor((2 * s + 1000) / (2e0 * 1000))
             ELSE -floor((-2 * s + 1000) / (2e0 * 1000)) END / 1e6) AS bm25
FROM lexs
ORDER BY s DESC, doc_id LIMIT {_Q62_TOPK}
"""


def bm25_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw Okapi BM25 per-doc score (column ``_s``) for the pinned
    3-term query -- q62's scoring stage, shared with e10's hybrid
    fusion. Same plan shape: arrays_overlap pre-filter before the
    explode, broadcast df table; contributions 9dp-rounded before the
    per-doc sum so partial-agg order cannot flip downstream hashes."""
    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokenize("text").alias("ws"))
    n_docs, avgdl = base.agg(
        F.count(F.lit(1)), F.avg(F.size("ws"))
    ).first()
    if avgdl is None:
        # ZERO-doc corpus (r12 empty-tables hostile variant): no row
        # reaches the BM25 expression, so any finite placeholder keeps
        # the plan buildable and the result the same empty frame both
        # engines produce
        avgdl = 1.0

    terms = F.array(*[F.lit(t) for t in _Q62_TERMS])
    tok = (
        base.filter(F.arrays_overlap("ws", terms))
        .select("doc_id", F.size("ws").alias("dl"), F.explode("ws").alias("term"))
        .filter(F.col("term").isin(*_Q62_TERMS))
    )
    tf = tok.groupBy("doc_id", "term", "dl").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + _Q62_K1 * (
        1.0 - _Q62_B + _Q62_B * F.col("dl") / F.lit(float(avgdl))
    )
    contrib = tf.join(F.broadcast(df_t), "term").select(
        "doc_id",
        F.round(idf * (F.col("tf") * (_Q62_K1 + 1.0)) / denom, 9).alias("c"),
    )
    # exact integer NANO sum: c sits on the 1e-9 grid, so summing the
    # re-integerized values makes _s a bit-exact long -- rank boundaries
    # and ties are engine-independent (the t04/dup-heavy lesson: an
    # unrounded float sum of grid values diverges at one ulp between
    # engines exactly when two docs tie mathematically)
    return contrib.groupBy("doc_id").agg(
        F.sum(F.round(F.col("c") * 1_000_000_000).cast("long")).alias("_s")
    )


@register(
    "q62_bm25_topk",
    oracle=_Q62_ORACLE,
    doc="Okapi BM25 top-50 for a fixed 3-term query; arrays_overlap "
    "pre-filter before explode, broadcast df table, TakeOrdered top-k.",
)
def q62_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    s_ = F.col("_s")
    # half-away 6dp of the exact nano sum (no double round(): see
    # catalog.grid_mean_spark's rationale)
    bm25 = (
        F.when(s_ >= 0, F.floor((2 * s_ + 1000) / (2 * 1000))).otherwise(
            -F.floor((-2 * s_ + 1000) / (2 * 1000))
        )
        / F.lit(1e6)
    )
    return (
        bm25_doc_scores(spark, sf_dir)
        .orderBy(F.desc("_s"), "doc_id")
        .limit(_Q62_TOPK)
        .select("doc_id", bm25.alias("bm25"))
    )


# --------------------------------------------------------------------------
# q63: deterministic epoch shuffle + round-robin sharding. Pretraining
# loaders need the SAME pseudo-random corpus order on every rerun of an
# epoch: order by md5(epoch_salt || doc_id) (bit-identical in DuckDB, same
# contract as q28/q57), then stripe row_number() % n_shards so every shard
# gets an equal, deterministic slice. Scale shape: the sort is a
# range-partitioned total order (Spark's orderBy), the striping and the
# per-shard manifest aggregate are partial-agg friendly; output is
# n_shards rows. min(ord)/arg_min witness the order is the hashed one.
# --------------------------------------------------------------------------

_Q63_SALT = "epoch7|"
_Q63_SHARDS = 16

_Q63_ORACLE = f"""
WITH h AS (
  SELECT doc_id, n_chars, md5('{_Q63_SALT}' || doc_id::VARCHAR) AS ord
  FROM documents
), striped AS (
  SELECT doc_id, n_chars, ord,
         (row_number() OVER (ORDER BY ord, doc_id) - 1) % {_Q63_SHARDS} AS shard_id
  FROM h
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(substr(ord, 1, 8)) AS first_ord,
       arg_min(doc_id, ord) AS first_doc
FROM striped GROUP BY shard_id
"""


@register(
    "q63_epoch_shuffle_shards",
    oracle=_Q63_ORACLE,
    doc="Deterministic epoch shuffle (order by md5(salt||doc_id)) striped "
    "round-robin into 16 shards; per-shard manifest with order witness.",
)
def q63_epoch_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import striped_global_row_number

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "n_chars",
        F.md5(F.concat(F.lit(_Q63_SALT), F.col("doc_id").cast("string"))).alias("ord"),
    )
    # Two-level exact global rank: md5 sort keys are uniform, so a fixed
    # 2-hex-char prefix gives 256 balanced stripes -- no single-partition
    # window over the corpus (the r5 shape funneled every doc through one
    # task; this one's only global state is 256 collected stripe counts).
    ranked = striped_global_row_number(
        h, [F.asc("ord"), F.asc("doc_id")], F.substring("ord", 1, 2), rank_col="_grn"
    )
    striped = ranked.withColumn(
        "shard_id", ((F.col("_grn") - 1) % _Q63_SHARDS).cast("long")
    )
    return striped.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min(F.substring("ord", 1, 8)).alias("first_ord"),
        F.min_by("doc_id", "ord").alias("first_doc"),
    )


# --------------------------------------------------------------------------
# q64: vocabulary coverage curve -- tokenizer planning: after counting
# corpus token frequencies, what cumulative fraction of all tokens do the
# top-k vocabulary entries cover? One explode+groupBy (partial-agg
# combine does the heavy lifting map-side), then window arithmetic over
# the |vocab|-sized frequency table -- the expensive pass touches the
# corpus once; everything after is vocabulary-sized.
# --------------------------------------------------------------------------

_Q64_TOPK = 20

_Q64_ORACLE = f"""
WITH freq AS (
  SELECT term, count(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term
), tot AS (SELECT sum(cnt) AS total FROM freq)
SELECT term, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank,
       round(sum(cnt) OVER (ORDER BY cnt DESC, term
                            ROWS UNBOUNDED PRECEDING)::DOUBLE / tot.total, 8)
         AS cum_frac
FROM freq CROSS JOIN tot
ORDER BY rank LIMIT {_Q64_TOPK}
"""


@register(
    "q64_vocab_coverage",
    oracle=_Q64_ORACLE,
    doc="Vocabulary coverage curve: corpus token frequencies, cumulative "
    "coverage fraction of the top-20 entries (tokenizer planning).",
)
def q64_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokenize("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = freq.agg(F.sum("cnt")).first()[0]
    if total is None:
        total = 1  # zero-token corpus: top-k is empty, placeholder unused
    # Rank + prefix-sum only need the top-k rows (a prefix sum at rank r
    # depends solely on rows ranked <= r), so bound to TakeOrdered(k)
    # FIRST; the windows then see 20 rows, not the whole vocabulary.
    top = freq.orderBy(F.desc("cnt"), F.asc("term")).limit(_Q64_TOPK)
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    cum = Window.orderBy(F.desc("cnt"), F.asc("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum_frac",
            F.round(F.sum("cnt").over(cum).cast("double") / F.lit(float(total)), 8),
        )
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# q65: distributed Bloom-filter runtime pruning -- the "runtime row filter"
# Spark builds internally for dynamic join pruning, hand-rolled so the
# filter itself is oracle-verifiable. Build: hash each watchlist key twice
# (portable md5), set 2 bits in an m=1008-bit filter materialized as a
# 16-row (word_idx, bits) dim via groupBy+bit_or -- an aggregate, never a
# driver collect, so the build distributes at any |keys|. Probe: two
# broadcast equi-joins against the 16-row filter, pure bit-ops JVM-side.
# Bits are 0..62 per word (bit 63 avoided: DuckDB raises on 1<<63). The
# output reports measured false-positive pruning quality vs the exact
# semi-join.
# --------------------------------------------------------------------------

_Q65_WORDS = 16
_Q65_BITS = _Q65_WORDS * 63  # 1008 addressable bits, 0..62 used per word

_Q65_ORACLE = f"""
WITH keys AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > 9900
), key_bits AS (
  SELECT c_custkey,
         (('0x'||substr(md5('bf1|' || c_custkey::VARCHAR),1,8))::UBIGINT)::BIGINT
           % {_Q65_BITS} AS b1,
         (('0x'||substr(md5('bf2|' || c_custkey::VARCHAR),1,8))::UBIGINT)::BIGINT
           % {_Q65_BITS} AS b2
  FROM keys
), contrib AS (
  SELECT b1 // 63 AS word_idx, 1::BIGINT << (b1 % 63)::INT AS bits FROM key_bits
  UNION ALL
  SELECT b2 // 63, 1::BIGINT << (b2 % 63)::INT FROM key_bits
), bloom AS (
  SELECT word_idx, bit_or(bits) AS word FROM contrib GROUP BY word_idx
), probe AS (
  SELECT DISTINCT o_custkey AS k FROM orders
), probe_bits AS (
  SELECT k,
         (('0x'||substr(md5('bf1|' || k::VARCHAR),1,8))::UBIGINT)::BIGINT
           % {_Q65_BITS} AS b1,
         (('0x'||substr(md5('bf2|' || k::VARCHAR),1,8))::UBIGINT)::BIGINT
           % {_Q65_BITS} AS b2
  FROM probe
), tested AS (
  -- LEFT joins: a probe hashing into a word no key ever touched must FAIL
  -- the test (empty word = 0 bits), not vanish from n_probe.
  SELECT p.k,
         ((coalesce(w1.word, 0) & (1::BIGINT << (p.b1 % 63)::INT)) <> 0
          AND (coalesce(w2.word, 0) & (1::BIGINT << (p.b2 % 63)::INT)) <> 0)
           AS bloom_pass,
         EXISTS (SELECT 1 FROM keys kk WHERE kk.c_custkey = p.k) AS is_member
  FROM probe_bits p
  LEFT JOIN bloom w1 ON w1.word_idx = p.b1 // 63
  LEFT JOIN bloom w2 ON w2.word_idx = p.b2 // 63
)
SELECT CAST(count(*) AS BIGINT) AS n_probe,
       CAST(count(CASE WHEN bloom_pass THEN 1 END) AS BIGINT) AS n_pass,
       CAST(count(CASE WHEN is_member THEN 1 END) AS BIGINT) AS n_members,
       CAST(count(CASE WHEN bloom_pass AND NOT is_member THEN 1 END) AS BIGINT)
         AS n_false_pos,
       CAST(count(CASE WHEN is_member AND NOT bloom_pass THEN 1 END) AS BIGINT)
         AS n_false_neg
FROM tested
"""


@register(
    "q65_bloom_prune_join",
    oracle=_Q65_ORACLE,
    doc="Hand-rolled distributed Bloom filter (m=1008, k=2, portable md5 "
    "bits): build via groupBy+bit_or into a 16-row dim, probe via two "
    "broadcast joins; reports FP/FN vs the exact semi-join (FN must be 0).",
)
def q65_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import md5_hash32

    def bit_pos(col, seed: str):
        return md5_hash32(F.concat(F.lit(seed), col.cast("string"))) % _Q65_BITS

    cust = load_table(spark, sf_dir, "customer")
    keys = cust.filter(F.col("c_acctbal") > 9900).select("c_custkey")
    kb = keys.select(
        "c_custkey",
        bit_pos(F.col("c_custkey"), "bf1|").alias("b1"),
        bit_pos(F.col("c_custkey"), "bf2|").alias("b2"),
    )
    contrib = kb.select(
        (F.col("b1") / 63).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b1 % 63 AS INT))").alias("bits"),
    ).unionAll(
        kb.select(
            (F.col("b2") / 63).cast("long"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b2 % 63 AS INT))"),
        )
    )
    bloom = contrib.groupBy("word_idx").agg(F.bit_or("bits").alias("word"))

    probe = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    pb = probe.select(
        "k",
        bit_pos(F.col("k"), "bf1|").alias("b1"),
        bit_pos(F.col("k"), "bf2|").alias("b2"),
    )
    w1 = F.broadcast(bloom.select(F.col("word_idx").alias("wi1"), F.col("word").alias("word1")))
    w2 = F.broadcast(bloom.select(F.col("word_idx").alias("wi2"), F.col("word").alias("word2")))
    # membership is a SET property -- dedup before the flag join, or
    # duplicate key rows (the r13 dupx variant) fan every matching probe
    # out x(copies), inflating every count the oracle's EXISTS keeps at 1.
    member = F.broadcast(
        keys.select(F.col("c_custkey").alias("k"))
        .distinct()
        .withColumn("is_member", F.lit(True))
    )
    # Left joins so a probe hashing into an all-zero (absent) word fails
    # the membership test instead of disappearing from n_probe.
    tested = (
        pb.join(w1, (F.col("b1") / 63).cast("long") == F.col("wi1"), "left")
        .join(w2, (F.col("b2") / 63).cast("long") == F.col("wi2"), "left")
        .join(member, "k", "left")
        .select(
            (
                (
                    F.coalesce(F.col("word1"), F.lit(0).cast("long")).bitwiseAND(
                        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b1 % 63 AS INT))")
                    )
                    != 0
                )
                & (
                    F.coalesce(F.col("word2"), F.lit(0).cast("long")).bitwiseAND(
                        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b2 % 63 AS INT))")
                    )
                    != 0
                )
            ).alias("bloom_pass"),
            F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
        )
    )
    return tested.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.count(F.when(F.col("bloom_pass"), 1)).alias("n_pass"),
        F.count(F.when(F.col("is_member"), 1)).alias("n_members"),
        F.count(F.when(F.col("bloom_pass") & ~F.col("is_member"), 1)).alias("n_false_pos"),
        F.count(F.when(F.col("is_member") & ~F.col("bloom_pass"), 1)).alias("n_false_neg"),
    )


# --------------------------------------------------------------------------
# q66: interval-overlap join via bin bucketing. The naive formulation
# ("order interval overlaps month window") is an inequality join Spark
# can only run as a nested loop; the scale-safe plan EXPLODES each
# interval into the month bins it spans (bounded fan-out: interval days /
# bin width, here <= 3) and the overlap becomes a plain partial-agg
# groupBy on the bin key -- no join at all. The oracle states the naive
# inequality-join semantics and must produce identical results, proving
# the bin rewrite exact. Intervals are derived deterministically from
# orders (start = o_orderdate, length = o_orderkey % 45 days).
# --------------------------------------------------------------------------

_Q66_ORACLE = """
WITH iv AS (
  SELECT o_orderkey, o_totalprice, o_orderdate AS s,
         o_orderdate + ((o_orderkey % 45)::INT) * INTERVAL 1 DAY AS e
  FROM orders
), bounds AS (
  SELECT date_trunc('month', min(s)) AS lo, max(e) AS hi FROM iv
), months AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS month_start
  FROM bounds
)
SELECT strftime(m.month_start, '%Y-%m-%d') AS month_start,
       CAST(count(*) AS BIGINT) AS n_open,
       (sum(CAST(round(iv.o_totalprice * 100) AS BIGINT)) / 1e2) AS sum_open_value
FROM months m
JOIN iv ON iv.s < m.month_start + INTERVAL 1 MONTH AND iv.e >= m.month_start
GROUP BY m.month_start
"""


@register(
    "q66_interval_month_overlap",
    oracle=_Q66_ORACLE,
    doc="Interval-overlap join rewritten as bounded bin explode + groupBy "
    "(no inequality join / NLJ); oracle is the naive overlap join, "
    "proving the rewrite exact.",
)
def q66_interval_month_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        "o_totalprice",
        F.col("o_orderdate").alias("s"),
        F.expr("o_orderdate + make_interval(0, 0, 0, CAST(o_orderkey % 45 AS INT))").alias("e"),
    )
    # month boundaries are emitted as 'yyyy-MM-dd' STRINGS (the q40
    # discipline): a raw TIMESTAMP output overflows pandas' ns range once
    # an interval crosses 2262-04-11 (the r14 timex find), and DATE
    # round-trips as date-vs-datetime64 depending on the consumer's Arrow
    # conversion path; the formatted string is the one portable surface.
    # date_format lives in its own projection -- generators cannot nest.
    binned = iv.select(
        "o_totalprice",
        F.explode(
            F.expr("sequence(date_trunc('month', s), e, interval 1 month)")
        ).alias("month_ts"),
    ).select(
        "o_totalprice", F.date_format("month_ts", "yyyy-MM-dd").alias("month_start")
    )
    return binned.groupBy("month_start").agg(
        F.count(F.lit(1)).alias("n_open"),
        money_sum_spark("o_totalprice").alias("sum_open_value"),
    )


# --------------------------------------------------------------------------
# q67: Count-Min sketch heavy hitters. The streaming-friendly frequency
# sketch (d=4 rows x w=64 counters, portable md5 hashes) built as a plain
# partial-agg groupBy -- which IS the CMS merge property: counters from
# different partitions add, so the same plan distributes/merges at any
# scale and the sketch table is d*w rows regardless of input size.
# Probes (the exact top-10 users, deterministic tie-break) read their
# estimate as min over the d cells via one broadcast join; CMS guarantees
# est >= true (overcount only), which the output exposes per probe and
# the oracle re-derives identically.
# --------------------------------------------------------------------------

_Q67_D = 4
_Q67_W = 64
_Q67_TOPK = 10

_Q67_ORACLE = f"""
WITH ev AS (
  SELECT user_id FROM events
), rows_j AS (
  SELECT unnest(generate_series(0, {_Q67_D - 1})) AS j
), cells AS (
  SELECT j,
         (('0x'||substr(md5('cms'||j::VARCHAR||'|'||user_id::VARCHAR),1,8))::UBIGINT)::BIGINT
           % {_Q67_W} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM ev CROSS JOIN rows_j GROUP BY j, bucket
), truec AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
  FROM ev GROUP BY user_id
  ORDER BY count(*) DESC, user_id LIMIT {_Q67_TOPK}
), probe AS (
  SELECT t.user_id, t.true_cnt, r.j,
         (('0x'||substr(md5('cms'||r.j::VARCHAR||'|'||t.user_id::VARCHAR),1,8))::UBIGINT)::BIGINT
           % {_Q67_W} AS bucket
  FROM truec t CROSS JOIN rows_j r
)
SELECT p.user_id, p.true_cnt,
       min(c.cnt) AS est_cnt,
       min(c.cnt) - p.true_cnt AS overcount
FROM probe p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
GROUP BY p.user_id, p.true_cnt
"""


@register(
    "q67_countmin_heavy_hitters",
    oracle=_Q67_ORACLE,
    doc="Count-Min sketch (d=4, w=64, portable md5) built as a mergeable "
    "partial-agg groupBy; exact top-10 users probed against it, min-over-"
    "rows estimate and per-probe overcount (always >= 0) reported.",
)
def q67_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import md5_hash32

    def bucket(col, j: int):
        return md5_hash32(F.concat(F.lit(f"cms{j}|"), col.cast("string"))) % _Q67_W

    ev = load_table(spark, sf_dir, "events").select("user_id")
    cell_structs = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("j"),
                bucket(F.col("user_id"), j).alias("bucket"),
            )
            for j in range(_Q67_D)
        ]
    )
    cells = (
        ev.select(F.explode(cell_structs).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    truec = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "user_id")
        .limit(_Q67_TOPK)
    )
    probe = truec.select(
        "user_id",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        bucket(F.col("user_id"), j).alias("bucket"),
                    )
                    for j in range(_Q67_D)
                ]
            )
        ).alias("c"),
    ).select("user_id", "true_cnt", F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    return (
        probe.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(
            F.min("cnt").alias("est_cnt"),
            (F.min("cnt") - F.col("true_cnt")).alias("overcount"),
        )
    )


# --------------------------------------------------------------------------
# q68: windowed funnel analysis (view -> click within 24h -> purchase
# within 24h), the MATCH_RECOGNIZE-lite event-sequence primitive with
# the conversion-window semantics product analytics actually uses
# (first-touch anchoring: each step matches the FIRST qualifying event
# after the previous step, within the window). Per user, a JVM-side
# higher-order `aggregate` walks the time-sorted event list as a state
# machine whose accumulator is (stage, anchor_ts) -- no Python UDF, no
# per-step self-joins. Sort key is (ts, step_no), so simultaneous events
# resolve in funnel order; the oracle re-derives the same semantics with
# sequential conditional mins (>= lower bound because equal timestamps
# sort in funnel order; <= anchor+window upper bound). Scale shape:
# events are filtered to funnel types BEFORE the collect; per-user lists
# are session-sized; users with zero funnel events re-enter as stage 0
# via a distinct-users frame, never a corpus-wide collect.
# --------------------------------------------------------------------------

_Q68_WINDOW_MIN = 1440  # 24h conversion window: splits sf0.01 users 90/35/25

_Q68_ORACLE = f"""
WITH f1 AS (
  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS s1
  FROM events GROUP BY user_id
), f2 AS (
  SELECT e.user_id, any_value(f1.s1) AS s1,
         min(CASE WHEN e.event_type = 'click' AND e.ts >= f1.s1
                   AND e.ts <= f1.s1 + INTERVAL {_Q68_WINDOW_MIN} MINUTE
              THEN e.ts END) AS s2
  FROM events e JOIN f1 ON e.user_id = f1.user_id GROUP BY e.user_id
), f3 AS (
  SELECT e.user_id,
         min(CASE WHEN e.event_type = 'purchase' AND e.ts >= f2.s2
                   AND e.ts <= f2.s2 + INTERVAL {_Q68_WINDOW_MIN} MINUTE
              THEN e.ts END) AS s3,
         any_value(f2.s1) AS s1, any_value(f2.s2) AS s2
  FROM events e JOIN f2 ON e.user_id = f2.user_id GROUP BY e.user_id
)
SELECT CASE WHEN s3 IS NOT NULL THEN 3
            WHEN s2 IS NOT NULL THEN 2
            WHEN s1 IS NOT NULL THEN 1
            ELSE 0 END AS stage,
       CAST(count(*) AS BIGINT) AS n_users
FROM f3 GROUP BY 1
"""


def funnel_user_stages(
    ev: DataFrame, steps: tuple[str, ...], window_min: int | None = None
) -> DataFrame:
    """(user_id, ts, event_type) -> (user_id, stage): furthest funnel step
    each user reached, matching the FIRST qualifying event per step in
    time order (first-touch anchoring). With ``window_min`` set, each step
    beyond the first must land within that many minutes of the previous
    step's match. Events are filtered to funnel types BEFORE the per-user
    collect; simultaneous events resolve in funnel order via the
    (ts, step_no) sort key. Reusable core of q68; tie and window
    semantics pinned by tests/test_batch6_ops.py.
    """
    # NULL user_id is unattributable -- it cannot anchor a per-user funnel
    # and the oracle's user_id equi-joins drop it anyway; without this
    # filter the engine's distinct() user list counted a phantom NULL
    # "user" at stage 0 (r14 nullkeys find)
    ev = ev.filter(F.col("user_id").isNotNull())
    step = None
    for i, name in enumerate(steps, start=1):
        step = (
            F.when(F.col("event_type") == name, i)
            if step is None
            else step.when(F.col("event_type") == name, i)
        )
    funnel = ev.select("user_id", "ts", step.alias("step")).filter(
        F.col("step").isNotNull()
    )
    per_user = funnel.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "step"))).alias("seq")
    )
    n = len(steps)
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("anchor")
    )
    stage = F.aggregate(
        "seq",
        init,
        lambda acc, x: _funnel_advance(acc, x, n, window_min),
        lambda acc: acc["stage"],
    )
    staged = per_user.select("user_id", stage.alias("stage"))
    users = ev.select("user_id").distinct()
    return users.join(staged, "user_id", "left").select(
        "user_id", F.coalesce("stage", F.lit(0)).alias("stage")
    )


def _funnel_advance(acc, x, n_steps: int, window_min: int | None):
    out = None
    for i in range(1, n_steps + 1):
        cond = (acc["stage"] == i - 1) & (x["step"] == i)
        if window_min is not None and i > 1:
            cond = cond & (
                x["ts"] <= acc["anchor"] + F.expr(f"interval {window_min} minutes")
            )
        advanced = F.struct(F.lit(i).alias("stage"), x["ts"].alias("anchor"))
        out = F.when(cond, advanced) if out is None else out.when(cond, advanced)
    return out.otherwise(acc)


@register(
    "q68_funnel_stages",
    oracle=_Q68_ORACLE,
    doc="Windowed view->click->purchase funnel (24h conversion window, "
    "first-touch anchoring) via a JVM higher-order aggregate state "
    "machine; oracle = sequential conditional mins, identical ties.",
)
def q68_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    staged = funnel_user_stages(
        ev, ("view", "click", "purchase"), window_min=_Q68_WINDOW_MIN
    )
    return staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n_users"))


# --------------------------------------------------------------------------
# q69: retention cohort matrix -- the product-analytics staple. Cohort =
# each user's first active day; one row per (cohort_day, day_offset) with
# the distinct active users. Two partial-agg passes (first-touch per
# user, distinct user-days) joined on user_id; the matrix is
# |cohorts| x |days| -- tiny output regardless of input size.
# --------------------------------------------------------------------------

_Q69_ORACLE = """
WITH first_touch AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
  FROM events
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', f.cohort_day, a.active_day) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM active a JOIN first_touch f ON a.user_id = f.user_id
GROUP BY 1, day_offset
"""


@register(
    "q69_retention_cohorts",
    oracle=_Q69_ORACLE,
    doc="Retention cohort matrix: first-active-day cohorts x day offset "
    "-> distinct active users; two partial-agg passes + one join.",
)
def q69_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_touch = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    active = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("active_day")
    ).distinct()
    return (
        active.join(first_touch, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )



# --------------------------------------------------------------------------
# q71: KMV (k-minimum-values) distinct sketches with SET ALGEBRA -- the
# mergeable distinct-count sketch whose union/intersection estimates HLL
# cannot give directly. Hashes are portable md5, so unlike HLL (q44,
# rows-only) the whole structure -- per-type sketches, merged union
# sketch, Jaccard overlap, and the estimates themselves -- is
# bit-deterministic and oracle-exact. Saturation rule on both engines:
# a sketch holding fewer than k hashes IS the exact distinct set, so the
# estimate degrades gracefully to the true count (exercised at sf0.001
# where distinct users < k; the estimator path runs at sf0.01).
# Scale shape: one distinct-project of (type, hash), then everything is
# k-sized; sketch merge = k smallest of concatenated sketches, which is
# exactly how per-partition partial sketches would combine.
# --------------------------------------------------------------------------

_Q71_K = 64
_Q71_TYPES = ("click", "purchase")

_Q71_ORACLE = f"""
WITH hs AS (
  SELECT DISTINCT event_type,
         (('0x'||substr(md5('kmv|' || user_id::VARCHAR),1,8))::UBIGINT)::BIGINT AS h
  FROM events
  WHERE event_type IN ('click', 'purchase') AND user_id IS NOT NULL
), sk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hs
  ) WHERE rn <= {_Q71_K}
), kth AS (
  SELECT event_type, max(h) AS hk, count(*) AS sz FROM sk GROUP BY event_type
), est_t AS (
  SELECT event_type,
         CASE WHEN sz < {_Q71_K} THEN sz
              ELSE CAST(round(({_Q71_K} - 1) * 4294967296.0 / hk) AS BIGINT)
         END AS est
  FROM kth
), su AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM sk)
  ) WHERE rn <= {_Q71_K}
), ua AS (
  SELECT max(h) AS uhk, count(*) AS usz FROM su
), est_u AS (
  SELECT CASE WHEN usz < {_Q71_K} THEN usz
              ELSE CAST(round(({_Q71_K} - 1) * 4294967296.0 / uhk) AS BIGINT)
         END AS est_union, usz
  FROM ua
), inter AS (
  SELECT count(*) AS ic FROM su
  WHERE EXISTS (SELECT 1 FROM sk a WHERE a.event_type = 'click' AND a.h = su.h)
    AND EXISTS (SELECT 1 FROM sk b WHERE b.event_type = 'purchase' AND b.h = su.h)
), ex AS (
  SELECT DISTINCT event_type, user_id FROM events
  WHERE event_type IN ('click', 'purchase') AND user_id IS NOT NULL
), exacts AS (
  SELECT count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS exact_click,
         count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS exact_purchase,
         count(DISTINCT user_id) AS exact_union
  FROM ex
), exact_int AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_intersect FROM (
    SELECT user_id FROM ex GROUP BY user_id HAVING count(*) = 2
  )
)
SELECT (SELECT est FROM est_t WHERE event_type = 'click') AS est_click,
       (SELECT est FROM est_t WHERE event_type = 'purchase') AS est_purchase,
       e.est_union,
       CAST(round(i.ic * 1.0 / e.usz * e.est_union) AS BIGINT) AS est_intersect,
       x.exact_click, x.exact_purchase, x.exact_union,
       n.exact_intersect
FROM est_u e, inter i, exacts x, exact_int n
"""


@register(
    "q71_kmv_sketch_setops",
    oracle=_Q71_ORACLE,
    doc="KMV distinct sketches (k=64, portable md5) with set algebra: "
    "per-type estimates, merged-union estimate, Jaccard intersection "
    "estimate, all vs exacts; saturated sketches degrade to exact counts.",
)
def q71_kmv_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import md5_hash32

    k = _Q71_K
    # NULL user_id has no identity to count: distinct sketches and exact
    # distinct counts both exclude it, like SQL count(DISTINCT). Without
    # the filter the engines disagree TWICE (r14 nullkeys find): Spark
    # sorts the NULL hash FIRST into the bottom-k sketch where DuckDB
    # sorts it last, and the engine's groupBy-based exact side counts the
    # NULL group where count(DISTINCT) skips it.
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_Q71_TYPES) & F.col("user_id").isNotNull()
    )
    hs = ev.select(
        "event_type",
        md5_hash32(F.concat(F.lit("kmv|"), F.col("user_id").cast("string"))).alias("h"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    # sk is k-sized per type (<= 128 rows total); localCheckpoint materializes
    # the events scan + distinct + window ONCE, so the several sketch-algebra
    # branches below reuse it instead of re-running the scan per action.
    sk = (
        hs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .localCheckpoint(eager=True)
    )
    kth = sk.groupBy("event_type").agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("sz")
    )
    est = F.when(F.col("sz") < k, F.col("sz")).otherwise(
        F.round((k - 1) * 4294967296.0 / F.col("hk")).cast("long")
    )
    ests = kth.select("event_type", est.alias("est")).agg(
        F.max(F.when(F.col("event_type") == "click", F.col("est"))).alias("est_click"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("est"))).alias(
            "est_purchase"
        ),
    )
    # Bottom-k of the distinct union hashes: TakeOrdered (per-task k-heap,
    # driver merges k per partition) -- no single-partition ranking window.
    su = sk.select("h").distinct().orderBy("h").limit(k)
    in_click = sk.filter(F.col("event_type") == "click").select("h")
    in_purch = sk.filter(F.col("event_type") == "purchase").select("h")
    # Union/intersection estimates stay IN-PLAN: F.round is half-away-from-
    # zero, matching DuckDB's round() -- driver-side Python round() would be
    # banker's rounding and flip exact-.5 estimates by 1.
    ua = su.agg(F.max("h").alias("uhk"), F.count(F.lit(1)).alias("usz"))
    est_u = ua.select(
        F.when(F.col("usz") < k, F.col("usz"))
        .otherwise(F.round((k - 1) * 4294967296.0 / F.col("uhk")).cast("long"))
        .alias("est_union"),
        "usz",
    )
    inter = (
        su.join(in_click, "h", "left_semi")
        .join(in_purch, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    est_setops = est_u.crossJoin(inter).select(
        "est_union",
        # try_divide: an EMPTY union sketch (usz=0, e.g. the r12
        # single-row hostile variant where no event matches the sketch
        # types) is 0/0 -- Spark ANSI throws where DuckDB's division
        # returns NULL; both engines must publish NULL
        F.round(
            F.try_divide(F.col("ic") * 1.0, F.col("usz")) * F.col("est_union")
        )
        .cast("long")
        .alias("est_intersect"),
    )

    # Exact side in ONE scan: per-user type flags, then a single rollup gives
    # all four exact counts (vs. two separate distinct+agg passes).
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("hc"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("hp"),
    )
    # coalesce(sum, 0): over ZERO sketch-type users (r12 single-row
    # hostile variant) sum() is NULL where the oracle's distinct counts
    # are 0 -- both engines must publish 0 exact counts
    exacts = per_user.agg(
        F.coalesce(F.sum("hc"), F.lit(0)).cast("long").alias("exact_click"),
        F.coalesce(F.sum("hp"), F.lit(0)).cast("long").alias("exact_purchase"),
        F.count(F.lit(1)).alias("exact_union"),
        F.coalesce(F.sum(F.col("hc") * F.col("hp")), F.lit(0))
        .cast("long")
        .alias("exact_intersect"),
    )
    return (
        ests.crossJoin(est_setops)
        .crossJoin(exacts)
        .select(
            "est_click",
            "est_purchase",
            "est_union",
            "est_intersect",
            "exact_click",
            "exact_purchase",
            "exact_union",
            "exact_intersect",
        )
    )
