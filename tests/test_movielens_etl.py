"""End-to-end MovieLens ETL tests -- the reference's own correctness checks
(SURVEY section 5: cardinality preservation, 'Other' zip fill, year
extraction, genre arrays) on deterministic fixtures."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.functions.movielens import (
    AGE_GROUPS,
    etl_pipeline,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.sources.generators import (
    write_movielens_fixtures,
)


@pytest.fixture(scope="module")
def etl(spark):
    d = tempfile.mkdtemp(prefix="mras_ml_")
    paths = write_movielens_fixtures(d)
    return etl_pipeline(spark, paths["movies"], paths["users"], paths["ratings"])


def test_movies_schema_and_year(etl):
    movies = etl["movies"]
    assert [f.name for f in movies.schema] == ["filmId", "film", "genders", "year"]
    rows = movies.collect()
    assert len(rows) == 200
    for r in rows:
        assert 1950 <= r["year"] <= 2000
        assert "(" not in r["film"]  # year stripped
        assert 1 <= len(r["genders"]) <= 3
        assert "" not in r["genders"]  # empties filtered (F6)


def test_users_age_groups_and_state(etl):
    users = etl["users"]
    rows = users.collect()
    assert len(rows) == 300
    valid = {m for m, _ in AGE_GROUPS.values()}
    letters = {l for _, l in AGE_GROUPS.values()}
    for r in rows:
        assert r["age_group_mean"] in valid
        assert r["age_group_letter"] in letters
        assert r["state"] is not None
    # planted unmapped zips (uid % 29 == 0) must be 'Other'
    others = users.filter(F.col("state") == "Other").count()
    assert others >= 300 // 29


def test_ratings_date_format(etl):
    r = etl["ratings"].first()
    assert len(r["date"]) == 10 and r["date"][2] == "/" and r["date"][5] == "/"
    assert r["ts"] is not None


def test_denormalized_preserves_cardinality(etl):
    """The reference's core row-count audit: left joins must not drop or
    duplicate fact rows (Explorativa1_pyspark.ipynb:367)."""
    assert etl["ratings_full"].count() == etl["ratings"].count() == 5025


def test_orphan_films_yield_nulls(etl):
    orphans = etl["ratings_full"].filter(F.col("film").isNull()).count()
    assert orphans > 0  # planted ~2% orphan filmIds


def test_occupation_labels(etl):
    labs = {r["occupation"] for r in etl["users"].select("occupation").distinct().collect()}
    assert "programmer" in labs and labs.issubset(
        set(__import__(
            "modelorecomendacion_analisisspark_streaming_mas_spark.functions.movielens",
            fromlist=["OCCUPATIONS"],
        ).OCCUPATIONS.values())
    )


def test_python_datasource_dat_matches_csv_reader(spark, tmp_path):
    """Spark 4 Python Data Source: format('dat') must produce exactly the
    rows the csv-based read_dat produces on the same `::` fixtures
    (differential oracle, one partition per file)."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.generators import (
        write_movielens_fixtures,
    )
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.python_datasource import (
        register_dat_source,
    )
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import read_dat
    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.movielens import (
        RATINGS_RAW_SCHEMA,
    )

    paths = write_movielens_fixtures(str(tmp_path), n_movies=50, n_users=60, n_ratings=800)
    register_dat_source(spark)

    via_ds = (
        spark.read.format("dat")
        .schema(RATINGS_RAW_SCHEMA)
        .load(paths["ratings"])
    )
    via_csv = read_dat(spark, paths["ratings"], RATINGS_RAW_SCHEMA)
    assert via_ds.schema == via_csv.schema
    a = sorted(map(tuple, via_ds.collect()))
    b = sorted(map(tuple, via_csv.collect()))
    assert a == b and len(a) == 825

    # movies: string columns with multi-char '::' delimiter and '|' genres
    movies_schema = "filmId int, film string, genders string"
    m_ds = spark.read.format("dat").schema(movies_schema).load(paths["movies"])
    m_csv = read_dat(spark, paths["movies"], movies_schema)
    assert sorted(map(tuple, m_ds.collect())) == sorted(map(tuple, m_csv.collect()))
    # one input partition per file
    assert m_ds.rdd.getNumPartitions() == 1


def test_python_datasource_dat_crlf_and_malformed_numerics(spark, tmp_path):
    """CRLF line endings must not leave \\r on the last column, and a
    malformed numeric field becomes null (PERMISSIVE, matching the csv
    twin) instead of raising in the task."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.python_datasource import (
        register_dat_source,
    )

    p = tmp_path / "crlf.dat"
    p.write_bytes(b"1::alpha::10\r\n2::beta::oops\r\n3::gamma\r\n")
    register_dat_source(spark)
    rows = sorted(
        map(
            tuple,
            spark.read.format("dat")
            .schema("id int, name string, score int")
            .load(str(p))
            .collect(),
        )
    )
    # row 1: clean parse, no trailing \r on score; row 2: 'oops' -> null;
    # row 3: short line -> missing trailing field null
    assert rows == [(1, "alpha", 10), (2, "beta", None), (3, "gamma", None)]


def test_collect_lookup_map_guard(spark):
    """collect_lookup_map: happy path returns the dict; a dim past the cap
    fails loudly with the broadcast-join suggestion instead of baking an
    unbounded map literal into every task (VERDICT r3 item 5)."""
    import pytest
    from modelorecomendacion_analisisspark_streaming_mas_spark.functions.etl import (
        collect_lookup_map,
    )

    dim = spark.createDataFrame(
        [(i, f"label{i}") for i in range(8)], "k int, v string"
    )
    assert collect_lookup_map(dim, "k", "v", max_rows=8) == {
        i: f"label{i}" for i in range(8)
    }
    with pytest.raises(ValueError, match="broadcast join"):
        collect_lookup_map(dim, "k", "v", max_rows=5)


def test_python_datasource_dat_rejects_unsupported_types(spark, tmp_path):
    """The Arrow fast path supports numeric/string columns only; anything
    else (boolean here) must fail loudly at read time instead of emitting
    a string array that mismatches the declared schema."""
    import pytest

    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.python_datasource import (
        register_dat_source,
    )

    p = tmp_path / "bad.dat"
    p.write_text("1::true\n")
    register_dat_source(spark)
    with pytest.raises(Exception, match="unsupported field type"):
        spark.read.format("dat").schema("id int, flag boolean").load(str(p)).collect()


def test_load_events_normalizes_every_shipped_ts_physical_type(spark, tmp_path):
    """The driver regenerates testdata between rounds and events.ts has
    shipped as THREE different parquet physical types: TIMESTAMP(NANOS)
    (Spark 4 refuses outright without the nanosAsLong legacy conf),
    timestamp[us] NTZ (watermarks reject TIMESTAMP_NTZ), and tz-aware
    timestamp[us]. load_events must normalize all three to a plain
    TIMESTAMP column with identical wall-clock values -- this pins the
    nanos branch, which current testdata (micros NTZ) never exercises."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import (
        load_events,
    )

    wall = [
        datetime.datetime(2024, 3, 1, 12, 0, 0, 250000),
        datetime.datetime(2024, 3, 2, 23, 59, 59, 999999),
    ]
    variants = {
        "nanos": pa.timestamp("ns"),
        "micros_ntz": pa.timestamp("us"),
        "micros_utc": pa.timestamp("us", tz="UTC"),
    }
    got = {}
    for name, ts_type in variants.items():
        d = tmp_path / name
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(wall, pa.timestamp("us")).cast(ts_type),
            }
        )
        # version 2.6 preserves NANOS instead of silently coercing to micros
        pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
        ev = load_events(spark, str(d))
        assert dict(ev.dtypes)["ts"] == "timestamp", (name, ev.dtypes)
        got[name] = sorted(r["ts"] for r in ev.select("ts").collect())
    assert got["nanos"] == got["micros_ntz"] == got["micros_utc"] == wall, got
