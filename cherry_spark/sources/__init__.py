from cherry_spark.sources.tables import TABLE_NAMES, load_table, read_tables  # noqa: F401
