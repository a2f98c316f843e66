"""MovieLens-shaped ETL pipeline (the reference's Explorativa1 surface,
SURVEY.md section 2.13 entry point 1) -- raw ``::``-separated .dat files ->
cleaned dims -> denormalized fact.

Reference parity, re-expressed Spark-first:
  * movies: year regex-extract (F1), title strip (F2), genre split+filter
    (F3/F6)  -- Explorativa1_pyspark.ipynb:90-94
  * users: age code -> (group mean, letter) via programmatic when-chain
    (P5, :258-266); occupation code -> label via map literal (P6,
    :252-256); zip -> state via BROADCAST RANGE JOIN replacing the
    reference's row-at-a-time Python UDF (U1, :268-287); unmatched ->
    'Other' (P8, :287)
  * ratings: epoch -> dd/MM/yyyy string (F4, :360) -- kept as strings for
    reference parity, with the proper timestamp alongside
  * denormalized fact: ratings |><| movies |><| users left joins (J1,
    :362-365); both dims broadcast (they are ~10^3-10^4 rows vs a fact that
    scales to 10^9+)

All schemas explicit (section 1.3). The MovieLens code tables are public
dataset constants (MovieLens-1M README).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from .etl import (
    epoch_to_ddmmyyyy,
    extract_year_from_title,
    map_lookup,
    range_lookup_join,
    split_to_array,
    strip_title_year,
)

MOVIES_RAW_SCHEMA = StructType(
    [
        StructField("filmId", IntegerType()),
        StructField("film", StringType()),
        StructField("genders", StringType()),
    ]
)

USERS_RAW_SCHEMA = StructType(
    [
        StructField("userId", IntegerType()),
        StructField("gender", StringType()),
        StructField("age", IntegerType()),
        StructField("occupation", IntegerType()),
        StructField("zip", StringType()),
    ]
)

RATINGS_RAW_SCHEMA = StructType(
    [
        StructField("userId", IntegerType()),
        StructField("filmId", IntegerType()),
        StructField("rating", IntegerType()),
        StructField("timestamp", IntegerType()),
    ]
)

# MovieLens-1M age code -> (group mean, letter) -- the reference's derived
# columns (datasets/Transformados/users_mod_head.csv:1).
AGE_GROUPS: dict[int, tuple[int, str]] = {
    1: (17, "A"),
    18: (21, "B"),
    25: (30, "C"),
    35: (40, "D"),
    45: (47, "E"),
    50: (52, "F"),
    56: (60, "G"),
}

# MovieLens-1M occupation code table (public dataset README).
OCCUPATIONS: dict[int, str] = {
    0: "other", 1: "academic/educator", 2: "artist", 3: "clerical/admin",
    4: "college/grad student", 5: "customer service", 6: "doctor/health care",
    7: "executive/managerial", 8: "farmer", 9: "homemaker", 10: "K-12 student",
    11: "lawyer", 12: "programmer", 13: "retired", 14: "sales/marketing",
    15: "scientist", 16: "self-employed", 17: "technician/engineer",
    18: "tradesman/craftsman", 19: "unemployed", 20: "writer",
}

# 3-digit zip prefix -> state ranges (public USPS prefix allocation; a
# compact representative table -- same semantics as the reference's 58-row
# list: range lookup with 'Other' for unmatched).
ZIP_STATE_RANGES: list[tuple[int, int, str]] = [
    (10, 27, "MA"), (28, 29, "RI"), (30, 38, "NH"), (39, 49, "ME"),
    (50, 59, "VT"), (60, 69, "CT"), (70, 89, "NJ"), (100, 149, "NY"),
    (150, 196, "PA"), (200, 205, "DC"), (206, 219, "MD"), (220, 246, "VA"),
    (270, 289, "NC"), (290, 299, "SC"), (300, 319, "GA"), (320, 349, "FL"),
    (350, 369, "AL"), (370, 385, "TN"), (400, 427, "KY"), (430, 459, "OH"),
    (460, 479, "IN"), (480, 499, "MI"), (500, 528, "IA"), (530, 549, "WI"),
    (550, 567, "MN"), (600, 629, "IL"), (630, 658, "MO"), (660, 679, "KS"),
    (700, 714, "LA"), (730, 749, "OK"), (750, 799, "TX"), (800, 816, "CO"),
    (850, 865, "AZ"), (870, 884, "NM"), (890, 898, "NV"), (900, 961, "CA"),
    (970, 979, "OR"), (980, 994, "WA"),
]


def clean_movies(raw: DataFrame) -> DataFrame:
    """movies.dat -> (filmId, film, genders array, year)."""
    return raw.select(
        "filmId",
        strip_title_year(F.col("film")).alias("film"),
        split_to_array(F.col("genders")).alias("genders"),
        extract_year_from_title(F.col("film")).alias("year"),
    )


def zip_state_ranges_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        ZIP_STATE_RANGES, "zlow int, zhigh int, state string"
    )


def clean_users(raw: DataFrame, spark: SparkSession) -> DataFrame:
    """users.dat -> (userId, gender, occupation label, age_group_mean,
    age_group_letter, state)."""
    mean_expr = None
    letter_expr = None
    for code, (mean, letter) in AGE_GROUPS.items():
        cond = F.col("age") == code
        mean_expr = F.when(cond, mean) if mean_expr is None else mean_expr.when(cond, mean)
        letter_expr = (
            F.when(cond, letter) if letter_expr is None else letter_expr.when(cond, letter)
        )
    with_groups = raw.select(
        "userId",
        "gender",
        map_lookup(OCCUPATIONS, "occupation").alias("occupation"),
        mean_expr.alias("age_group_mean"),
        letter_expr.alias("age_group_letter"),
        F.substring("zip", 1, 3).cast("int").alias("zip3"),
    )
    return range_lookup_join(
        with_groups,
        "zip3",
        zip_state_ranges_df(spark),
        "zlow",
        "zhigh",
        "state",
        out_col="state",
        default="Other",
    ).drop("zip3")


def clean_ratings(raw: DataFrame) -> DataFrame:
    """ratings.dat -> date string (reference keeps dd/MM/yyyy) + proper
    timestamp column (our addition for real temporal queries)."""
    return raw.select(
        "userId",
        "filmId",
        "rating",
        epoch_to_ddmmyyyy(F.col("timestamp")).alias("date"),
        F.timestamp_seconds(F.col("timestamp")).alias("ts"),
    )


def denormalize(ratings: DataFrame, movies: DataFrame, users: DataFrame) -> DataFrame:
    """J1: the full fact -- left joins preserve rating cardinality
    (orphan filmIds allowed per FIXTURES.md section 3)."""
    return ratings.join(F.broadcast(movies), "filmId", "left").join(
        F.broadcast(users), "userId", "left"
    )


def etl_pipeline(
    spark: SparkSession, movies_path: str, users_path: str, ratings_path: str
) -> dict[str, DataFrame]:
    """Full Explorativa1 pipeline from raw .dat paths."""
    from ..sources.readers import read_dat

    movies = clean_movies(read_dat(spark, movies_path, MOVIES_RAW_SCHEMA))
    users = clean_users(read_dat(spark, users_path, USERS_RAW_SCHEMA), spark)
    ratings = clean_ratings(read_dat(spark, ratings_path, RATINGS_RAW_SCHEMA))
    return {
        "movies": movies,
        "users": users,
        "ratings": ratings,
        "ratings_full": denormalize(ratings, movies, users),
    }
