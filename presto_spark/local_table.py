"""Driver-local rows → DataFrame without the pickled-RDD round trip.

``SparkSession.createDataFrame(list, schema)`` ships the rows through
``applySchemaToPythonRDD``: a pickled Python RDD whose every evaluation
pays a Python-worker launch per partition (~0.3 s per evaluation
measured at r16, regardless of row count — and a plan that references
the local table from several branches pays it once per un-reused
branch).  Converting through pandas instead hands the rows to the Arrow
``createDataFrame`` path: the batch is serialized once on the driver
and evaluates JVM-side, no Python workers.

Values are unchanged: rows are held in an object-dtype frame so pandas
cannot coerce them (ints with None stay ints, not float64) and the
explicit schema drives the Arrow cast, exactly as the classic path's
type binder does.  Any input the Arrow path rejects — and the
empty-rows edge, where a columnless pandas frame cannot bind a schema —
falls back to the original ``createDataFrame(list)`` code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """rows (list of tuples) + DDL schema string → DataFrame, preferring
    the Arrow batch path over the pickled-RDD path."""
    if rows:
        try:
            import pandas as pd

            return spark.createDataFrame(
                pd.DataFrame(rows, dtype=object), schema)
        except Exception:
            pass
    return spark.createDataFrame(rows, schema)
