"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference MovieLens recommendation + streaming system
(Jorge-Maraver/ModeloRecomendacion_AnalisisSpark_Streaming_Mas), rebuilt
Spark-first per SURVEY.md.

Layout:
  session    -- SparkSession factory with scale-aware defaults
  sources    -- batch + streaming readers/writers (S1-S12)
  functions  -- scalar expression library (P1-P9, F1-F7, U1)
  operators  -- relational/top-k/dedup/similarity operators (A*, W*, O*, L*)
  plans      -- named query catalog with DuckDB oracle twins
  streaming  -- Structured Streaming pipelines (T1-T8)
  ml         -- ALS recommendation train/serve (M1-M7)
  graph      -- degree/PageRank/connected-components (G1-G4)
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
