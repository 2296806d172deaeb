from presto_spark.functions.registry import register_functions
from presto_spark.functions.dialect import translate

__all__ = ["register_functions", "translate"]
