"""Arrow-batched pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations``:
pandas_udf resolves signatures from live type hints, and PEP-563
stringified annotations break that resolution.
"""

import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    """Unicode NFC via unicodedata, one Arrow batch at a time."""
    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )
