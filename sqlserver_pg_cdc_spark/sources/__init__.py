from sqlserver_pg_cdc_spark.sources.parquet import load_table, register_views  # noqa: F401
