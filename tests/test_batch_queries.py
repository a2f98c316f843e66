"""Every registered catalog query must hash-match its DuckDB oracle twin
(the driver's CORRECTNESS gate, run here at sf0.001 for speed; the driver
runs sf0.01). Oracle-less queries get the weaker rows-only check."""

from __future__ import annotations

import pytest

from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY

from .conftest import assert_frames_match


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only smoke: it ran and produced a frame
        assert len(sdf.columns) > 0
        return
    odf = duck.execute(q.oracle).df()
    assert_frames_match(sdf, odf, name)


def test_approx_distinct_error(spark, sf_dir):
    """HLL++ approx_count_distinct stays within its advertised error of the
    exact distinct count (the scale path for distinct aggregation)."""
    from pyspark.sql import functions as F
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_hll_sketch_error(spark, sf_dir):
    """q44's DataSketches HLL estimates (including the cross-half
    hll_union_agg merge) stay within 5% of exact distinct counts."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    got = {
        r["o_orderpriority"]: r["approx_custs"]
        for r in REGISTRY["q44_hll_sketch_distinct"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:
        assert abs(got[k] - exact[k]) / exact[k] < 0.05, (k, got[k], exact[k])


def test_approx_quantile_api(spark, sf_dir):
    """A5: DataFrame.approxQuantile with error 0.0 == exact median, the
    reference's exact idiom (Explorativa/Explorativa2.ipynb:358)."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    [med] = li.approxQuantile("l_quantity", [0.5], 0.0)
    import duckdb

    exact = duckdb.sql(
        f"SELECT quantile_disc(l_quantity, 0.5) FROM '{sf_dir}/lineitem.parquet'"
    ).fetchone()[0]
    assert abs(med - exact) < 1e-9
