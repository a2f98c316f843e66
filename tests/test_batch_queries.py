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


def test_money_mean_half_cent_is_engine_independent(spark):
    """catalog.money_mean_spark/_sql: a group whose TRUE mean lands
    exactly on a half-cent must round away from zero in BOTH engines.
    This is the case where round(avg(x), 2) silently diverges -- Spark's
    round is Java HALF_UP on the double's exact decimal expansion while
    DuckDB's rounds the scaled float -- observed live under drift
    variants (q05: -297.965 -> Spark -297.97 vs DuckDB -297.96)."""
    import duckdb

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.catalog import (
        money_mean_spark,
        money_mean_sql,
    )

    rows = [
        ("pos_half", 1.00), ("pos_half", 1.01),    # mean 1.005 -> 1.01
        ("neg_half", -1.00), ("neg_half", -1.01),  # mean -1.005 -> -1.01
        ("exact", 2.00), ("exact", 2.02),          # mean 2.01 exactly
        ("plain", 3.10), ("plain", 3.17),          # mean 3.135 -> 3.14
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        r["g"]: r["m"]
        for r in df.groupBy("g").agg(money_mean_spark("x").alias("m")).collect()
    }
    assert got == {"pos_half": 1.01, "neg_half": -1.01, "exact": 2.01, "plain": 3.14}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT col0 AS g, col1::DOUBLE AS x FROM (VALUES "
        + ", ".join(f"('{g}', {x}e0)" for g, x in rows)
        + ") v(col0, col1)"
    )
    want = dict(
        con.execute(f"SELECT g, {money_mean_sql('x')} AS m FROM t GROUP BY g").fetchall()
    )
    assert want == got


def test_grid_mean_half_boundary_is_engine_independent(spark):
    """catalog.grid_mean_spark/_sql (money_mean generalized, r11 after a
    fresh-salt drift sweep caught t14's round(avg(6dp), 6) diverging):
    for every (in_scale, out_dp) branch -- input grid finer, equal, and
    coarser than the output grid, plus a non-decimal grid (fifths) --
    a group whose TRUE mean lands exactly on a half-output-unit must
    round away from zero in BOTH engines, and NULLs must follow avg()
    semantics."""
    import duckdb

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.catalog import (
        grid_mean_spark,
        grid_mean_sql,
    )

    cases = [
        # (label, in_scale, out_dp, values, expected)
        # integers -> 2dp: mean 2.005 (half-cent) -> 2.01? values must
        # sit on 1/1 grid: 2 and 3 -> mean 2.5 -> out 4dp half? use
        # out_dp where half occurs: ints 1,2 -> mean 1.5 at 0dp-grid is
        # trivially representable at 2dp; engineer halves per branch:
        ("int_to_2dp", 1, 2, [1.0, 2.0], 1.5),               # exact, no rounding
        ("cents_to_4dp_half", 100, 4, [0.01, 0.02, 0.02, 0.02], 0.0175),
        ("sixdp_to_6dp_half", 1_000_000, 6, [0.000001, 0.000002], 0.000002),
        ("ninedp_to_6dp_half", 1_000_000_000, 6, [1.0000005, 1.0000005], 1.000001),
        ("fifths_to_6dp", 5, 6, [0.2, 0.4, 0.4], 0.333333),
        ("neg_half", 1_000_000, 6, [-0.000001, -0.000002], -0.000002),
    ]
    rows = []
    for label, _mi, _dp, vals, _want in cases:
        rows += [(label, float(v)) for v in vals]
    rows.append(("null_case", None))
    rows.append(("null_case", 4.0))
    df = spark.createDataFrame(rows, "g string, x double")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT col0 AS g, col1::DOUBLE AS x FROM (VALUES "
        + ", ".join(
            f"('{g}', {'NULL' if x is None else f'CAST({x!r} AS DOUBLE)'})"
            for g, x in rows
        )
        + ") v(col0, col1)"
    )
    for label, mi, dp, vals, want in cases:
        got = (
            df.filter(df.g == label)
            .groupBy("g")
            .agg(grid_mean_spark("x", mi, dp).alias("m"))
            .collect()[0]["m"]
        )
        duck = con.execute(
            f"SELECT {grid_mean_sql('x', mi, dp)} AS m FROM t WHERE g = '{label}'"
        ).fetchone()[0]
        assert got == want == duck, (label, got, want, duck)
    # NULL semantics: avg ignores nulls -> mean of {4.0} = 4.0
    got = (
        df.filter(df.g == "null_case")
        .groupBy("g")
        .agg(grid_mean_spark("x", 1, 2).alias("m"))
        .collect()[0]["m"]
    )
    duck = con.execute(
        f"SELECT {grid_mean_sql('x', 1, 2)} AS m FROM t WHERE g = 'null_case'"
    ).fetchone()[0]
    assert got == 4.0 == duck


def test_grid_mean_exactness_guard_fails_loudly_out_of_range(spark):
    """r11 ADVICE: the grid-mean exactness precondition
    (2*mul*|s| + n*r < 2^52) is ENFORCED inside the returned expression,
    not just documented -- a sum past the bound must RAISE instead of
    silently rounding one ulp wrong, for both grid_mean_spark and
    money_mean_spark; in-range and all-NULL groups are untouched."""
    import pytest

    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.catalog import (
        grid_mean_spark,
        money_mean_spark,
    )

    big = float(2**53)  # exactly representable; 2*|s| blows the 2^52 bound
    over = spark.createDataFrame([(big,), (big,)], "x double")
    with pytest.raises(Exception, match="exactness bound"):
        over.agg(grid_mean_spark("x", 1, 0).alias("m")).collect()
    # money: 1e14 "dollars" -> 1e16 cents per row crosses the bound too
    money_over = spark.createDataFrame([(1e14,), (1e14,)], "x double")
    with pytest.raises(Exception, match="exactness bound"):
        money_over.agg(money_mean_spark("x").alias("m")).collect()
    # in-range groups and all-NULL groups keep their pre-guard results
    ok = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    assert ok.agg(grid_mean_spark("x", 1, 2).alias("m")).collect()[0]["m"] == 1.5
    assert ok.agg(money_mean_spark("x").alias("m")).collect()[0]["m"] == 1.5
    nulls = spark.createDataFrame([(None,), (None,)], "x double")
    assert nulls.agg(grid_mean_spark("x", 1, 2).alias("m")).collect()[0]["m"] is None


def test_q17_q44_emit_validation_columns(spark, sf_dir):
    """r15: the last two rows-only entries join the ALS family's
    self-validation upgrade -- the output rows must SAY the sampling /
    sketch-accuracy contract held (the in-query asserts turn a violation
    into a red driver entry)."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY

    q17 = REGISTRY["q17_sample_stats"].fn(spark, sf_dir).toPandas()
    assert {"split_ok", "frac_ok", "seed_stable"} <= set(q17.columns)
    assert q17["split_ok"].all() and q17["frac_ok"].all() and q17["seed_stable"].all()
    total = int(q17.loc[q17.subset == "total", "n"].iloc[0])
    tr = int(q17.loc[q17.subset == "split_train", "n"].iloc[0])
    te = int(q17.loc[q17.subset == "split_test", "n"].iloc[0])
    assert tr + te == total

    q44 = REGISTRY["q44_hll_sketch_distinct"].fn(spark, sf_dir).toPandas()
    assert {"rel_err", "err_ok"} <= set(q44.columns)
    assert q44["err_ok"].all()
    assert (q44["rel_err"] <= 0.05).all()
