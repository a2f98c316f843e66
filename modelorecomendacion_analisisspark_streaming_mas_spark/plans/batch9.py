"""Round-7 catalog additions -- LLM-data-pipeline operators, Spark-first
and oracle-paired:

* t14: CCNet-style perplexity quality filter (Wenzek et al. 2020,
  "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  Data"): a Laplace-smoothed bigram LM trained on a clean held-out
  slice scores every document; documents bucket into head/middle/tail.
  t08 self-scores the corpus under its own MLE model (no smoothing, no
  held-out split); t14 is the production filter shape -- a FROZEN
  reference LM applied to unseen text, with unseen-token mass handled
  explicitly.

Scale notes inline; the LM tables are model artifacts (bounded by the
clean slice's vocabulary, independent of corpus size) and broadcast,
so scoring is a scan-shaped map-side join -- exactly how a KenLM binary
rides in a real CCNet job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register

# CCNet buckets the corpus into head/middle/tail thirds by perplexity;
# fixed cross-entropy cuts near the observed terciles keep the entry
# deterministic (a percentile cut would put a float rank boundary in the
# oracle). Classification happens on the 6dp-ROUNDED score both engines.
_T14_HEAD = 3.48
_T14_MIDDLE = 3.56

_T14_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
), pos AS (
  SELECT doc_id, source, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
  FROM tok
), big AS (
  SELECT a.doc_id, a.source, a.w AS w1, b.w AS w2
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.w <> '' AND b.w <> ''
), slice_big AS (
  SELECT w1, w2 FROM big JOIN documents USING (doc_id)
  WHERE lang = 'en' AND doc_id % 5 = 0
), c12 AS (
  SELECT w1, w2, count(*) AS n12 FROM slice_big GROUP BY w1, w2
), c1 AS (
  SELECT w1, count(*) AS n1 FROM slice_big GROUP BY w1
), v AS (
  SELECT count(DISTINCT w) AS vs FROM (
    SELECT unnest(ws) AS w FROM tok JOIN documents USING (doc_id)
    WHERE lang = 'en' AND doc_id % 5 = 0
  ) WHERE w <> ''
), sc AS (
  -- per-bigram -ln pre-rounded to 9dp before the per-doc avg (q62
  -- device); doc score rounded to 6dp before bucketing
  SELECT big.doc_id, big.source,
         round(avg(round(-ln((coalesce(n12, 0) + 1)
               / CAST(coalesce(n1, 0) + vs AS DOUBLE)), 9)), 6) AS ce
  FROM big LEFT JOIN c12 USING (w1, w2) LEFT JOIN c1 USING (w1)
       CROSS JOIN v
  GROUP BY big.doc_id, big.source
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ce), 6) AS avg_ce,
       CAST(count(*) FILTER (WHERE ce < {_T14_HEAD}) AS BIGINT) AS n_head,
       CAST(count(*) FILTER (WHERE ce >= {_T14_HEAD} AND ce < {_T14_MIDDLE})
            AS BIGINT) AS n_middle,
       CAST(count(*) FILTER (WHERE ce >= {_T14_MIDDLE}) AS BIGINT) AS n_tail
FROM sc GROUP BY source ORDER BY source
"""


@register(
    "t14_perplexity_filter",
    oracle=_T14_ORACLE,
    doc="CCNet-style perplexity filter (Wenzek et al. 2020): Laplace-"
    "smoothed bigram LM from the clean en/doc_id%5 slice, every doc "
    "scored under the FROZEN model (unseen tokens get 1/(0+V) mass), "
    "head/middle/tail buckets at fixed cuts on the rounded score.",
)
def t14_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref analog: the reference filters its ratings corpus by
    hand-picked thresholds (Explorativa/Explorativa2.ipynb cell 6); this
    is the corpus-scale, model-based version every pretraining pipeline
    runs.

    Scale shape: ONE corpus scan builds the bigram stream; the LM (c12,
    c1, V) derives from the bounded clean slice and is broadcast -- the
    scoring join is map-side, no corpus shuffle besides the per-doc
    groupBy (partial-agg'd). At 100 TB the LM is a prebuilt artifact;
    here it is built in the same job from the slice for oracle parity.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", F.split("text", " ").alias("ws")
    )
    n = F.size("ws")
    bigrams = F.arrays_zip(
        F.slice("ws", 1, n - 1).alias("w1"), F.slice(F.col("ws"), 2, n - 1).alias("w2")
    )
    big = (
        docs.select("doc_id", "source", "lang", F.explode(bigrams).alias("b"))
        .select(
            "doc_id",
            "source",
            "lang",
            F.col("b.w1").alias("w1"),
            F.col("b.w2").alias("w2"),
        )
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    in_slice = (F.col("lang") == "en") & (F.col("doc_id") % 5 == 0)
    slice_big = big.filter(in_slice)
    c12 = slice_big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = slice_big.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    v = (
        docs.filter(in_slice)
        .select(F.explode("ws").alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w").alias("vs"))
    )
    lp = F.round(
        -F.log(
            (F.coalesce(F.col("n12"), F.lit(0)) + 1)
            / (F.coalesce(F.col("n1"), F.lit(0)) + F.col("vs")).cast("double")
        ),
        9,
    )
    sc = (
        big.join(F.broadcast(c12), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id", "source")
        .agg(F.round(F.avg(lp), 6).alias("ce"))
    )
    return (
        sc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("ce"), 6).alias("avg_ce"),
            F.sum((F.col("ce") < _T14_HEAD).cast("long")).alias("n_head"),
            F.sum(
                ((F.col("ce") >= _T14_HEAD) & (F.col("ce") < _T14_MIDDLE)).cast("long")
            ).alias("n_middle"),
            F.sum((F.col("ce") >= _T14_MIDDLE).cast("long")).alias("n_tail"),
        )
        .orderBy("source")
    )
