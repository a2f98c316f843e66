"""Training-data curation ops, round 3 additions: benchmark
decontamination, repetition metrics, stratified mixing. Extends the
north-star pillar (dedup/similarity/text) with the remaining steps a
100 TB pre-training pipeline runs between dedup and sampling.

Scale shapes (all JVM-expression only -- no Python in any hot path):

* d06: the benchmark side reduces to DISTINCT shingle hashes (tiny) and
  is broadcast; the corpus streams through one scan, one hash-join, and
  shuffles only per-doc hit counts -- never text.
* t06: two per-doc aggregates (one explode for token counts; n-gram
  ratios are pure array expressions per row), joined on doc_id.
* q49: a pure projection+filter (the md5 bucket pushes to the scan) and
  one per-source aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_hash32, shingles, token_count, tokenize
from ..graph.algorithms import connected_components
from ..operators.dedup import minhash_near_duplicates
from ..sources.readers import load_table
from .catalog import register, shingle_rows_sql
from .textops import _D02_PAIR_CTES

# portable 32-bit md5 hash in DuckDB SQL (same as textops)
_DUCK_H32 = "(('0x'||substr(md5({expr}),1,8))::UBIGINT)::BIGINT"



# --------------------------------------------------------------------------
# d06: benchmark decontamination. The deterministic "benchmark" slice
# (doc_id % 97 == 0 -- an eval set by construction) contributes its
# distinct word-5-gram hashes; every other document is scored by how many
# of its distinct 5-grams appear in that set. The standard pre-training
# hygiene step: training text overlapping an eval benchmark inflates
# scores, so contaminated docs are flagged (and dropped by a downstream
# filter on n_contaminated > 0).
# --------------------------------------------------------------------------

# 5-gram shingle rows via catalog.shingle_rows_sql (lead() windows --
# the slice comprehension is quadratic in doc length, r14 longstr find);
# DISTINCT per _rid reproduces the old per-row list_distinct exactly
# (duplicate doc rows keep their multiplicity).
_D06_ORACLE = f"""
WITH tok AS MATERIALIZED (
  SELECT row_number() OVER () AS _rid, doc_id, source,
         string_split(text, ' ') AS t
  FROM documents
), {shingle_rows_sql('tok', 5, 'doc_id, source')},
sh AS (
  SELECT DISTINCT _rid, doc_id, source, g AS s FROM shw
), hashed AS (
  SELECT doc_id, source, {_DUCK_H32.format(expr='s')} AS h FROM sh
), bench AS (
  SELECT DISTINCT h FROM hashed WHERE doc_id % 97 = 0
), hits AS (
  SELECT c.doc_id, c.source, count(DISTINCT c.h) AS n_hits
  FROM hashed c JOIN bench b USING (h)
  WHERE c.doc_id % 97 <> 0
  GROUP BY c.doc_id, c.source
)
SELECT d.source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN h.n_hits IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST(coalesce(sum(h.n_hits), 0) AS BIGINT) AS n_hits
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 97 <> 0
GROUP BY d.source
"""


@register("d06_contamination_check", oracle=_D06_ORACLE)
def d06_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(shingles(tokenize(F.col("text")), 5))).alias("s"),
    ).select("doc_id", "source", md5_hash32(F.col("s")).alias("h"))
    bench = hashed.filter(F.col("doc_id") % 97 == 0).select("h").distinct()
    corpus = hashed.filter(F.col("doc_id") % 97 != 0)
    hits = (
        corpus.join(F.broadcast(bench), "h")
        .groupBy("doc_id", "source")
        .agg(F.countDistinct("h").alias("n_hits"))
    )
    return (
        docs.filter(F.col("doc_id") % 97 != 0)
        .select("doc_id", "source")
        .join(hits.select("doc_id", "n_hits"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("n_hits").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
            F.coalesce(F.sum("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )


# --------------------------------------------------------------------------
# t06: repetition metrics (the Gopher/RefinedWeb quality signals):
# top-token dominance and duplicated-3-gram mass per document. Documents
# ranked most-repetitive first; the downstream filter drops the tail.
# --------------------------------------------------------------------------

_T06_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), tok3 AS MATERIALIZED (
  SELECT row_number() OVER () AS _rid, doc_id, string_split(text, ' ') AS t
  FROM documents
), flat AS (
  SELECT doc_id, unnest(t) AS w FROM tok
), cnt AS (
  SELECT doc_id, w, count(*) AS c FROM flat GROUP BY doc_id, w
), dom AS (
  SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 4) AS top_token_ratio
  FROM cnt GROUP BY doc_id
), {shingle_rows_sql('tok3', 3, 'doc_id', out='shw3')},
rep AS (
  -- distinct/total 3-gram counts per PHYSICAL row (lead() windows via
  -- catalog.shingle_rows_sql; the slice comprehension was quadratic in
  -- doc length -- t06 stalled on 1 MiB docs, r14 longstr find)
  SELECT doc_id,
         round(1.0 - count(DISTINCT g) / CAST(count(g) AS DOUBLE), 4)
           AS dup_3gram_ratio
  FROM shw3 GROUP BY _rid, doc_id
)
SELECT d.doc_id, r.dup_3gram_ratio, d.top_token_ratio
FROM dom d JOIN rep r USING (doc_id)
ORDER BY r.dup_3gram_ratio DESC, d.doc_id
LIMIT 100
"""


@register("t06_repetition_metrics", oracle=_T06_ORACLE)
def t06_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", tokenize(F.col("text")).alias("t"))
    # duplicated-3-gram mass: pure array expressions, no explode
    sh3 = shingles(F.col("t"), 3)
    rep = tok.select(
        "doc_id",
        F.round(
            1.0 - F.size(F.array_distinct(sh3)) / F.size(sh3).cast("double"), 4
        ).alias("dup_3gram_ratio"),
    )
    # top-token dominance: one explode + two-level aggregate
    dom = (
        tok.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.max("c") / F.sum("c").cast("double"), 4).alias("top_token_ratio"))
    )
    return (
        rep.join(dom, "doc_id")
        .orderBy(F.desc("dup_3gram_ratio"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "dup_3gram_ratio", "top_token_ratio")
    )


# --------------------------------------------------------------------------
# q49: stratified source mixing -- deterministic per-stratum hash
# sampling toward a target mix (here: source-id mod 3 buckets at
# 50/25/10 percent). The reproducible "data mixing" step: rates are a
# pure expression, the bucket filter is content-hashed (stable across
# runs/engines/partitionings, same contract as q28) and pushes into the
# scan.
# --------------------------------------------------------------------------

_Q49_ORACLE = f"""
WITH rated AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
         CASE (substr(source, 4)::INT % 3)
           WHEN 0 THEN 50 WHEN 1 THEN 25 ELSE 10 END AS rate,
         {_DUCK_H32.format(expr="'mix|' || doc_id::VARCHAR")} % 100 AS bucket
  FROM documents
)
SELECT source, count(*) AS n_sampled, CAST(sum(n_tokens) AS BIGINT) AS sampled_tokens
FROM rated WHERE bucket < rate
GROUP BY source
"""


@register("q49_stratified_source_sample", oracle=_Q49_ORACLE)
def q49_stratified_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.substring("source", 4, 10).cast("int") % 3 == 0, 50)
        .when(F.substring("source", 4, 10).cast("int") % 3 == 1, 25)
        .otherwise(10)
    )
    bucket = md5_hash32(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))) % 100
    return (
        docs.filter(bucket < rate)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(token_count(F.col("text"))).alias("sampled_tokens"),
        )
    )


# --------------------------------------------------------------------------
# d07: near-dup CLUSTERING -- the step real pipelines run after pair
# finding. Pairwise near-dup relations are not transitive, so "drop the
# later doc of each pair" over-deletes (a-b and b-c would drop both b and
# c even when a-c are unrelated); the standard fix is connected components
# over the pair graph, keeping exactly one canonical doc (min doc_id) per
# cluster. Composes d02's verified LSH pairs with the G4 component engine
# (graph/algorithms.py connected_components: min-label propagation +
# pointer jumping, O(log diameter) rounds).
#
# Scale shape: the pair graph is VASTLY smaller than the corpus (only
# docs with a >=0.8-Jaccard partner appear), so the CC loop iterates on a
# frame of near-dup docs only -- the corpus-sized stages are exactly
# d02's (one shuffle each), and the loop input fits the counted broadcast
# path of connected_components at any realistic dup rate.
#
# Oracle: d02's pair-lattice CTEs verbatim (textops._D02_PAIR_CTES) +
# the g03-style unrolled min-label+pointer-jump recurrence. 8 rounds of
# path-halving cover components of diameter 2^8; tests plant a chain and
# pin Spark==oracle equality.
# --------------------------------------------------------------------------


def _d07_oracle(rounds: int = 8) -> str:
    ctes = [
        _D02_PAIR_CTES.strip(),
        """pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8
)""",
        """sym AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
)""",
        "verts AS (\n  SELECT DISTINCT src AS id FROM sym\n)",
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
        ctes.append(
            f"""l{n} AS MATERIALIZED (
  SELECT a.id, b.lab FROM p{n} a JOIN p{n} b ON a.lab = b.id
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT lab AS keep_id,
       count(*) AS n_docs,
       count(*) - 1 AS n_removed
FROM l{rounds} GROUP BY lab ORDER BY keep_id
"""
    )


# --------------------------------------------------------------------------
# t07: PII redaction. The synthetic corpus carries no PII, so the entry
# PLANTS it deterministically (every 7th doc gets an email + phone + URL
# derived from doc_id -- both engines build the identical dirty text) and
# then scrubs with the standard regex battery. Verified not just by
# counts: a checksum over the scrubbed text proves the replacement output
# is byte-identical between engines.
#
# Scale shape: pure per-row JVM regex projection (no Python, no shuffle
# before the final per-source aggregate). Patterns are RE2-compatible so
# the same strings drive Java regex (Spark) and RE2 (DuckDB).
# --------------------------------------------------------------------------

_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"
_URL_RE = r"https?://[^ ]+"

# deterministic dirty-text construction, mirrored 1:1 in the oracle
_INJ_A = " contact user"
_INJ_B = "@example.com or call 555-0176 or visit https://ex"
_INJ_C = ".example.org today"

_T07_ORACLE = f"""
WITH dirty AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0
              THEN text || '{_INJ_A}' || doc_id::VARCHAR || '{_INJ_B}'
                   || (doc_id % 50)::VARCHAR || '{_INJ_C}'
              ELSE text END AS t
  FROM documents
), scrubbed AS (
  SELECT doc_id, source,
         len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
         len(regexp_extract_all(t, '{_URL_RE}'))   AS n_urls,
         regexp_replace(regexp_replace(regexp_replace(t,
           '{_EMAIL_RE}', '<EMAIL>', 'g'),
           '{_URL_RE}', '<URL>', 'g'),
           '{_PHONE_RE}', '<PHONE>', 'g') AS clean
  FROM dirty
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_emails + n_phones + n_urls > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pii_docs,
       CAST(sum(n_emails) AS BIGINT) AS emails_redacted,
       CAST(sum(n_phones) AS BIGINT) AS phones_redacted,
       CAST(sum(n_urls) AS BIGINT)   AS urls_redacted,
       CAST(sum({_DUCK_H32.format(expr='clean')}) AS BIGINT) AS scrub_checksum
FROM scrubbed GROUP BY source
"""


@register("t07_pii_redaction", oracle=_T07_ORACLE)
def t07_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(_INJ_A),
            F.col("doc_id").cast("string"),
            F.lit(_INJ_B),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(_INJ_C),
        ),
    ).otherwise(F.col("text"))
    scrubbed = docs.select(
        "source",
        F.regexp_count(dirty, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(dirty, F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_count(dirty, F.lit(_URL_RE)).alias("n_urls"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(dirty, _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
            ),
            _PHONE_RE,
            "<PHONE>",
        ).alias("clean"),
    )
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_emails") + F.col("n_phones") + F.col("n_urls") > 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_pii_docs"),
        F.sum("n_emails").cast("long").alias("emails_redacted"),
        F.sum("n_phones").cast("long").alias("phones_redacted"),
        F.sum("n_urls").cast("long").alias("urls_redacted"),
        F.sum(md5_hash32(F.col("clean"))).cast("long").alias("scrub_checksum"),
    )


def _near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared d07/d09 front half: LSH pair graph -> (id, component)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.8, num_hashes=16, bands=4, shingle_n=3
    )
    # Materialize the (tiny) pair graph once: connected_components derives
    # its label frame from `verts`, and without the checkpoint every CC
    # round would otherwise re-run the whole MinHash pipeline.
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return connected_components(verts, edges)


@register("d07_near_dup_clusters", oracle=_d07_oracle(8))
def d07_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = _near_dup_components(spark, sf_dir)
    return (
        cc.groupBy(F.col("component").alias("keep_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) - 1).alias("n_removed"),
        )
        .orderBy("keep_id")
    )


# --------------------------------------------------------------------------
# d09: QUALITY-based canonical selection. d07 keeps the min-doc_id member
# of each near-dup cluster (the usual convention); production pipelines
# keep the BEST member -- here max n_chars, doc_id as the deterministic
# tie-break. Same pair graph and CC labels as d07; the selection is one
# window rank over the cluster-sized label frame joined to a metadata
# projection of the corpus (never the text payload). Oracle = d07's
# unrolled CC lattice + the identical rank.
# --------------------------------------------------------------------------


def _d09_oracle(rounds: int = 8) -> str:
    base = _d07_oracle(rounds)
    final = base.rindex("SELECT lab AS keep_id")
    return (
        base[:final]
        + """SELECT lab AS cluster_id, id AS keep_id, n_chars AS keep_chars,
       n_docs
FROM (
  SELECT l.lab, l.id, d.n_chars,
         CAST(count(*) OVER (PARTITION BY l.lab) AS BIGINT) AS n_docs,
         row_number() OVER (PARTITION BY l.lab
                            ORDER BY d.n_chars DESC, l.id) AS rn
  FROM l"""
        + str(rounds)
        + """ l JOIN documents d ON l.id = d.doc_id
) WHERE rn = 1
"""
    )


@register(
    "d09_canonical_keep_best",
    oracle=_d09_oracle(8),
    doc="Near-dup clusters keep the highest-quality member (max n_chars, "
    "doc_id tie-break) instead of min-id; window rank over cluster-sized "
    "frame joined to a metadata-only corpus projection.",
)
def d09_canonical_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cc = _near_dup_components(spark, sf_dir)
    meta = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = cc.join(meta, cc["id"] == meta["doc_id"]).select(
        F.col("component").alias("cluster_id"), "id", "n_chars"
    )
    w = Window.partitionBy("cluster_id")
    rank_w = w.orderBy(F.desc("n_chars"), F.asc("id"))
    return (
        labeled.withColumn("n_docs", F.count(F.lit(1)).over(w))
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("id").alias("keep_id"),
            F.col("n_chars").alias("keep_chars"),
            "n_docs",
        )
    )


# --------------------------------------------------------------------------
# q70: the curation-pipeline CAPSTONE, composing the round-4 operators
# end-to-end the way a pretraining data job actually runs them:
#
#   1. source-level quality gate (q61's rounded-mean threshold);
#   2. near-dup clustering among SURVIVING docs only (d02 pair lattice +
#      CC), keeping the best member per cluster (d09's max-n_chars rank);
#   3. deterministic epoch-shuffle striping of the kept docs into 8
#      training shards (q63's md5 order);
#   -> per-shard manifest (n_docs, sum_chars).
#
# The oracle is the full composition: q61's gate CTEs feeding d02's
# lattice (its `documents` scan rewritten to the gated frame), the CC
# rounds, the keep-best rank, and the striping -- one SQL statement
# whose hash must match the four-stage DataFrame pipeline. Scale shape
# inherits from the parts: the gate broadcasts, the LSH self-join is
# band-bucketed over gated docs only, CC iterates on the pair graph, and
# the stripe sorts KEPT docs (the smallest frame in the pipeline).
# --------------------------------------------------------------------------

_Q70_THRESHOLD = 0.50
_Q70_SHARDS = 8
_Q70_SALT = "curate7|"


def _q70_oracle(rounds: int = 8) -> str:
    gate = f"""doc_q AS (
  SELECT doc_id, source, n_chars, text,
         len(list_distinct(string_split(text, ' ')))::DOUBLE
           / len(string_split(text, ' ')) AS ratio
  FROM documents
), good_src AS (
  SELECT source FROM doc_q GROUP BY source
  HAVING round(avg(ratio), 6) >= {_Q70_THRESHOLD}
), gated AS (
  SELECT d.doc_id, d.source, d.n_chars, d.text
  FROM doc_q d JOIN good_src g ON d.source = g.source
)"""
    lattice = _D02_PAIR_CTES.replace("FROM documents", "FROM gated")
    ctes = [
        gate,
        lattice,
        """pairs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8
)""",
        """sym AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
)""",
        "cverts AS (\n  SELECT DISTINCT src AS id FROM sym\n)",
        "l0 AS MATERIALIZED (\n  SELECT id, id AS lab FROM cverts\n)",
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
        ctes.append(
            f"""l{n} AS MATERIALIZED (
  SELECT a.id, b.lab FROM p{n} a JOIN p{n} b ON a.lab = b.id
)"""
        )
    tail = f"""drop_list AS (
  -- every clustered doc EXCEPT the best (max n_chars, min doc_id) per cluster
  SELECT id AS doc_id FROM (
    SELECT l.id, row_number() OVER (PARTITION BY l.lab
                                    ORDER BY d.n_chars DESC, l.id) AS rn
    FROM l{rounds} l JOIN gated d ON l.id = d.doc_id
  ) WHERE rn > 1
), kept AS (
  SELECT g.doc_id, g.n_chars,
         md5('{_Q70_SALT}' || g.doc_id::VARCHAR) AS ord
  FROM gated g ANTI JOIN drop_list x ON g.doc_id = x.doc_id
), striped AS (
  SELECT n_chars,
         (row_number() OVER (ORDER BY ord, doc_id) - 1) % {_Q70_SHARDS} AS shard_id
  FROM kept
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM striped GROUP BY shard_id"""
    return "WITH " + ",\n".join(ctes) + ",\n" + tail


@register(
    "q70_curation_pipeline_v2",
    oracle=_q70_oracle(8),
    doc="Capstone composition: source gate (q61) -> near-dup keep-best "
    "(d02+CC+d09) on survivors -> md5 epoch striping into 8 shards "
    "(q63); single composed SQL oracle.",
)
def q70_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.topk import striped_global_row_number

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    doc_q = docs.select(
        "doc_id",
        "source",
        "n_chars",
        "text",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ratio"),
    )
    good_src = (
        doc_q.groupBy("source")
        .agg(F.round(F.avg("ratio"), 6).alias("r"))
        .filter(F.col("r") >= _Q70_THRESHOLD)
        .select("source")
    )
    gated = doc_q.join(F.broadcast(good_src), "source").select(
        "doc_id", "n_chars", "text"
    )
    # Materialize once: the LSH pipeline, CC loop, and the final anti-join
    # all derive from this frame.
    gated = gated.localCheckpoint(eager=True)

    pairs = minhash_near_duplicates(
        gated, "doc_id", "text", threshold=0.8, num_hashes=16, bands=4, shingle_n=3
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(verts, edges)
    meta = gated.select("doc_id", "n_chars")
    rank_w = Window.partitionBy("component").orderBy(F.desc("n_chars"), F.asc("id"))
    drop_list = (
        cc.join(meta, cc["id"] == meta["doc_id"])
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") > 1)
        .select(F.col("id").alias("doc_id"))
    )
    kept = gated.join(drop_list, "doc_id", "left_anti").select(
        "doc_id",
        "n_chars",
        F.md5(F.concat(F.lit(_Q70_SALT), F.col("doc_id").cast("string"))).alias("ord"),
    )
    # Two-level exact global rank (same construction as q63): md5 'ord' is
    # uniform, so a 2-hex-char prefix stripes the corpus into 256 balanced
    # ranking partitions instead of one global single-partition window.
    ranked = striped_global_row_number(
        kept, [F.asc("ord"), F.asc("doc_id")], F.substring("ord", 1, 2), rank_col="_grn"
    )
    striped = ranked.withColumn(
        "shard_id", ((F.col("_grn") - 1) % _Q70_SHARDS).cast("long")
    )
    return striped.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


# --------------------------------------------------------------------------
# d10: INCREMENTAL index-probe dedup -- the ingestion-time shape: the
# existing corpus (doc_id % 2 == 0) is banded once into a persistent LSH
# index; a new batch (odd ids) bands only itself and equi-joins the
# index, so per-batch cost tracks the batch, not the corpus. Each new doc
# reports its best existing match (highest exact Jaccard >= 0.8,
# dup_of tie-break). Oracle: d02's signature lattice with the candidate
# join restricted to (new x existing) instead of the full self-join.
# --------------------------------------------------------------------------


def _d10_oracle() -> str:
    prefix = _D02_PAIR_CTES.split(", cands AS")[0]
    return (
        "WITH "
        + prefix
        + """, cands AS (
  SELECT DISTINCT n.doc_id AS doc_id, e.doc_id AS dup_of
  FROM keyed n JOIN keyed e
    ON n.band_idx = e.band_idx AND n.band_key = e.band_key
   AND n.doc_id % 2 = 1 AND e.doc_id % 2 = 0
), verified AS (
  SELECT c.doc_id, c.dup_of,
         round(len(list_filter(sa.s, x -> list_contains(sb.s, x)))::DOUBLE
               / len(list_distinct(sa.s || sb.s)), 4) AS jaccard
  FROM cands c
  JOIN sh sa ON sa.doc_id = c.doc_id
  JOIN sh sb ON sb.doc_id = c.dup_of
)
SELECT doc_id, dup_of, jaccard FROM (
  SELECT doc_id, dup_of, jaccard,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY jaccard DESC, dup_of) AS rn
  FROM verified WHERE jaccard >= 0.8
) WHERE rn = 1
"""
    )


@register(
    "d10_incremental_index_dedup",
    oracle=_d10_oracle(),
    doc="Incremental dedup: new batch (odd ids) LSH-probed against the "
    "existing-corpus band index (even ids); best exact-Jaccard match per "
    "new doc; per-batch cost tracks the batch, not the corpus.",
)
def d10_incremental_index_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import lsh_probe_index, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    new_batch = docs.filter(F.col("doc_id") % 2 == 1)
    idx_sigs = minhash_signatures(existing, "doc_id", "text").cache()
    probe_sigs = minhash_signatures(new_batch, "doc_id", "text").cache()
    cands = lsh_probe_index(idx_sigs, probe_sigs)
    sets_p = probe_sigs.select("doc_id", F.col("shingle_set").alias("set_p"))
    sets_i = idx_sigs.select(
        F.col("doc_id").alias("dup_of"), F.col("shingle_set").alias("set_i")
    )
    verified = (
        cands.join(sets_p, "doc_id")
        .join(sets_i, "dup_of")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("set_p", "set_i"))
                / F.size(F.array_union("set_p", "set_i")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.8)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("jaccard"), F.asc("dup_of"))
    return (
        verified.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "dup_of", "jaccard")
    )
