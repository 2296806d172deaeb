"""Arrow-batched pandas UDFs for the extended-JSONPath tier.

Separate module WITHOUT ``from __future__ import annotations`` —
pandas_udf resolves signatures from live type hints and PEP-563
stringified annotations break it (same convention as
presto_spark/llm/_pandas_udfs.py).

These are the Python fallback for JSONPath patterns Spark's JVM-side
``get_json_object`` can't parse (recursive descent, filters, bracket
names, slices — reference: JsonPath.java buildJayway).  The dialect
layer routes literal extended paths here; everything else stays on the
codegen path.  Per-batch the path is constant in practice (literal),
and ``jsonpath.tokenize`` is lru_cached, so cost is one Python pass per
Arrow batch — the acceptable slow tier, never the default.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType

from presto_spark.functions import jsonpath


# Paths may be per-row columns (the dialect routes non-literal path
# arguments here) — a NULL path yields NULL, like a NULL document.

@pandas_udf(StringType())
def json_extract_py(j: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series(
        [None if path is None else jsonpath.extract_json(doc, path)
         for doc, path in zip(j, p)],
        dtype="object",
    )


@pandas_udf(StringType())
def json_extract_scalar_py(j: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series(
        [None if path is None else jsonpath.extract_scalar(doc, path)
         for doc, path in zip(j, p)],
        dtype="object",
    )


@pandas_udf(LongType())
def json_size_py(j: pd.Series, p: pd.Series) -> pd.Series:
    return pd.Series(
        [None if path is None else jsonpath.json_size(doc, path)
         for doc, path in zip(j, p)],
        dtype="object",
    )
