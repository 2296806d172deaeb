"""Arrow-batched pandas UDFs for text functions.

Module WITHOUT ``from __future__ import annotations`` (pandas_udf needs
live type hints — same convention as llm/_pandas_udfs.py).
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf

from presto_spark.functions.porter import stem


@pandas_udf("string")
def word_stem_udf(w: pd.Series) -> pd.Series:
    """word_stem(w) — full Porter algorithm (WordStemFunction.java)."""
    return w.map(lambda x: stem(x) if x is not None else None)
