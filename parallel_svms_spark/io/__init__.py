from parallel_svms_spark.io.sources import load_table, TABLES  # noqa: F401
