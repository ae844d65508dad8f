"""soccerpredictor_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference project HansiChan/SoccerPredictor
(surveyed in SURVEY.md) as an idiomatic Apache Spark engine:

- storage: parquet tables with primary-key upsert semantics
  (reference: Kudu tables, SQL/DDL_SQL:1-56)
- relational layer: DataFrame/SQL compositions for every operator in
  SURVEY.md §2 (scans, filters, semi/left joins, top-K, pivot,
  CASE/cast/split/regex expressions, na.drop)
- ML layer: pyspark.ml pipelines keyed per (team, venue, task)
  (reference: XGBoost/Predictor.py)
- extensions: large-scale training-data pipeline operators (dedup,
  similarity search, text analysis, multimodal columns) and
  Structured Streaming over the events table.

Everything is built on public Apache Spark APIs only.
"""

from soccerpredictor_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
