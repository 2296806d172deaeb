"""presto_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of prestodb/presto.

This is NOT a port of Presto's Java MPP architecture (coordinator/worker,
HTTP exchanges, bytecode codegen — see reference
presto-main-base/src/main/java/com/facebook/presto/operator/).  Spark SQL +
Catalyst + Tungsten already provide that execution machinery; what this
package provides is:

* an engine facade (`Engine`) mirroring Presto's SQL entry point
  (reference: presto-tests/.../StandaloneQueryRunner.java),
* a Presto-compatibility function layer — Presto-spelled scalar/aggregate
  functions registered as JVM-side SQL UDFs (reference:
  presto-main-base/.../operator/scalar/, operator/aggregation/),
* relational operator helpers for every operator family in Presto's
  inventory (reference: presto-main-base/.../sql/planner/LocalExecutionPlanner.java),
* large-scale LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) built shuffle-aware for 100 TB.
"""

from presto_spark.engine import Engine
from presto_spark.session import get_spark, tune_for_input
from presto_spark.session_properties import set_session_property

__all__ = ["Engine", "get_spark", "tune_for_input", "set_session_property"]
__version__ = "0.1.0"
