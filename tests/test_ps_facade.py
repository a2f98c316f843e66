"""pandas-on-Spark facade: the reference's second dialect produces the same
numbers as the DataFrame path (the triple-implementation cross-check of
SURVEY section 5.2, automated)."""

from __future__ import annotations

import tempfile
import warnings

import pytest

from modelorecomendacion_analisisspark_streaming_mas_spark.functions.ps_facade import (
    movielens_ps_pipeline,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.functions.movielens import etl_pipeline
from modelorecomendacion_analisisspark_streaming_mas_spark.sources.generators import (
    write_movielens_fixtures,
)


@pytest.fixture(scope="module")
def paths():
    d = tempfile.mkdtemp(prefix="mras_ps_")
    return write_movielens_fixtures(d)


def test_ps_facade_matches_dataframe_path(spark, paths):
    warnings.filterwarnings("ignore")
    sdf = etl_pipeline(spark, paths["movies"], paths["users"], paths["ratings"])
    psf = movielens_ps_pipeline(spark, paths["movies"], paths["users"], paths["ratings"])
    # value_counts on the facade == groupBy count on the engine (A8 done both ways)
    ps_counts = psf["users"]["state"].value_counts().to_dict()
    df_counts = {
        r["state"]: r["count"] for r in sdf["users"].groupBy("state").count().collect()
    }
    assert ps_counts == df_counts
    assert len(psf["ratings_full"]) == sdf["ratings_full"].count()


def test_ps_elementwise_apply(spark, paths):
    """U2: element-wise lambda on the facade (Explorativa1_ps_pandas
    .ipynb:226-229's idiom) stays a Spark-executed transform."""
    warnings.filterwarnings("ignore")
    psf = movielens_ps_pipeline(spark, paths["movies"], paths["users"], paths["ratings"])
    lengths = psf["movies"]["film"].apply(len)
    assert int(lengths.max()) > 0 and len(lengths) == 200
