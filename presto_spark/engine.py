"""Engine facade — the Presto entry-point shape on a Spark runtime.

Presto's only query language is SQL, submitted over HTTP
(reference: presto-main/.../server/protocol/QueuedStatementResource.java:211)
or via embedded runners
(presto-tests/.../StandaloneQueryRunner.java).  The whole lifecycle —
parse (presto-parser/.../SqlParser.java:100), analyze
(presto-main-base/.../sql/analyzer/StatementAnalyzer.java:416), plan
(sql/planner/LogicalPlanner.java:185), optimize (sql/Optimizer.java:61),
fragment, schedule, execute — is replaced here by Spark SQL's
parser/Catalyst/AQE pipeline.  ``Engine.sql`` is the equivalent of
``QueryRunner.execute``; the DataFrame API is a second, Spark-native
surface Presto never had.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from presto_spark.functions.dialect import translate
from presto_spark.functions.registry import register_functions
from presto_spark.session_properties import set_session_property
from presto_spark.sources.catalog import TABLES, register_tables

_SET_SESSION_RE = re.compile(
    r"^\s*SET\s+SESSION\s+(\w+)\s*=\s*'?([^';]+)'?\s*;?\s*$", re.IGNORECASE
)


class Engine:
    """A query engine session: catalog + Presto-compat functions + SQL.

    Usage::

        eng = Engine(spark, sf_dir="/root/testdata/sf0.01")
        df = eng.sql("SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None, tables=TABLES):
        self.spark = spark
        register_functions(spark)
        self.tables: dict[str, DataFrame] = {}
        if sf_dir is not None:
            self.tables = register_tables(spark, sf_dir, tables)

    def sql(self, query: str, dialect: str = "presto") -> DataFrame:
        """Run SQL against the registered catalog (Presto's entry point A).

        ``dialect='presto'`` applies the name-level Presto→Spark rewrite
        (functions/dialect.py) before parsing; pass ``'spark'`` to skip.

        ``SET SESSION <prop> = <value>`` statements are routed through
        the session-property façade (session_properties.py — reference:
        SystemSessionProperties.java), mirroring Presto's session
        tuning surface; other statements go to Spark SQL.
        """
        m = _SET_SESSION_RE.match(query)
        if m:
            set_session_property(self.spark, m.group(1).lower(), m.group(2))
            return self.spark.createDataFrame([(True,)], "set_session boolean")
        if dialect == "presto":
            query = translate(query)
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        """DataFrame handle for a registered table (entry point B)."""
        return self.spark.table(name)

    def explain_str(self, query: str, mode: str = "formatted") -> str:
        """EXPLAIN surface (reference: operator/ExplainAnalyzeOperator.java)."""
        df = self.sql(query)
        return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), mode
        )
