"""Skew-mitigation operators (SURVEY section 4 / the 100 TB checklist):
salting for hot keys, two-phase aggregation, and bucketed co-located joins.

AQE's skew-join handling (on in session.py) splits oversized partitions at
runtime; these operators are the PLANNED-skew counterpart for when the hot
keys are known or cardinality is extreme:

* ``salted_group_count``: groupBy(key) where one key holds e.g. 30% of all
  rows -> one straggler task. Two phases: partial agg on (key, salt) spreads
  the hot key over ``n_salts`` tasks, final agg on key merges n_salts rows.
  Deterministic salt (hash of payload columns) keeps results reproducible.
* ``salted_broadcast_explode_join``: big-side skewed equi-join where the
  small side still exceeds the broadcast threshold slice-wise: the small
  side is EXPLODED n_salts times (one copy per salt), the big side salts
  deterministically, and the join key becomes (key, salt) -- each hot-key
  partition shrinks by n_salts.

Both are result-identical to their naive forms -- the catalog queries
q22/q23 pin that with DuckDB oracles over the UNsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _det_salt(cols: list[str], n_salts: int) -> Column:
    """Deterministic pseudo-random salt from payload columns (xxhash64 mod
    n) -- reproducible across runs, unlike F.rand()."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_group_count(
    df: DataFrame,
    key: str,
    salt_from: list[str],
    n_salts: int = 16,
    sum_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe groupBy: count (and optionally sum) per key."""
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    if sum_col:
        aggs.append(F.sum(sum_col).alias("_sum"))
    partial = (
        df.withColumn("_salt", _det_salt(salt_from, n_salts))
        .groupBy(key, "_salt")
        .agg(*aggs)
    )
    final = [F.sum("_cnt").alias("n")]
    if sum_col:
        final.append(F.sum("_sum").alias(f"sum_{sum_col}"))
    return partial.groupBy(key).agg(*final)


def salted_broadcast_explode_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: small side replicated per salt, big side salted
    deterministically; join on (key, salt).

    The exploded small side is explicitly broadcast -- n_salts copies can
    exceed ``autoBroadcastJoinThreshold`` even when one copy would not, and
    falling back to a shuffled join of the exploded table would silently
    defeat the whole point of salting (results stay identical either way).
    """
    small_exploded = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    big_salted = big.withColumn("_salt", _det_salt(salt_from, n_salts).cast("int"))
    return big_salted.join(F.broadcast(small_exploded), [key, "_salt"]).drop("_salt")
