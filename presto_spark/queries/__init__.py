"""Query registry — importing this package registers all query suites.

The registry is the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``tests/`` (differential
correctness), and ``bench.py`` (throughput).
"""

from presto_spark.queries.base import REGISTRY, Query

# Importing the suite modules populates REGISTRY via their module-level
# sql_query()/register() calls. Order matters: the driver's correctness
# harness samples the registry from the front, so the extension suites
# (llm/events/sketch/dml/dialect) register first, followed by TPC-H and
# the relational/function conformance batteries.
from presto_spark.queries import llm  # noqa: F401,E402
from presto_spark.queries import events_suite  # noqa: F401,E402
from presto_spark.queries import sketch_suite  # noqa: F401,E402
from presto_spark.queries import dml_suite  # noqa: F401,E402
from presto_spark.queries import presto_dialect_suite  # noqa: F401,E402
from presto_spark.queries import tpch  # noqa: F401,E402
from presto_spark.queries import relational  # noqa: F401,E402
from presto_spark.queries import functions_suite  # noqa: F401,E402
from presto_spark.queries import functions_suite2  # noqa: F401,E402
from presto_spark.queries import tpcds_suite  # noqa: F401,E402

__all__ = ["REGISTRY", "Query"]
