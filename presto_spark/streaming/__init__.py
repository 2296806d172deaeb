from presto_spark.streaming import windows  # noqa: F401
