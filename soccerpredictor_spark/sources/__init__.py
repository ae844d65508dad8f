"""Sources and sinks: parquet catalog, ingest adapters, upsert writer."""

from soccerpredictor_spark.sources.catalog import load_tables, read_table, register_views

__all__ = ["read_table", "load_tables", "register_views"]
