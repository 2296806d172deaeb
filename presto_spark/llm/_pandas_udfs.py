"""Arrow-batched pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations``:
pandas_udf resolves signatures from live type hints, and PEP-563
stringified annotations break that resolution.
"""

import re
import unicodedata

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc_normalize_udf(s: pd.Series) -> pd.Series:
    """Unicode NFC via unicodedata, one Arrow batch at a time."""
    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


# Java \s is the ASCII class [ \t\n\x0b\f\r], NOT Python's Unicode \s —
# the same divergence trap _py_shingles documents (llm/dedup.py).
_JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")

# llm/text.py STOPWORDS, frozen here so the UDF closure ships a set.
_STOPWORDS = frozenset(
    ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it"))


@pandas_udf("struct<nt:int,cs:bigint,sh:int>")
def text_token_stats_udf(texts: pd.Series) -> pd.DataFrame:
    """Token stats for llm/text.py with_text_stats, one Arrow batch at
    a time: token count ``nt``, summed token length ``cs``, stopword
    hits ``sh`` — each value-exact vs the Column-expression chain
    (``size(tokens)``, ``aggregate(+length)``, ``size(filter(isin))``):
    trim is spaces-only, lowercasing is Unicode, the split keeps the
    leading/trailing empty tokens Java's -1-limit split keeps, and the
    counts are exact integers (the float work stays JVM-side).  NULL
    text yields NULL struct fields; the caller coalesces to the legacy
    size(NULL) = -1 the Column path produced.  Pinned by
    test_with_text_stats_python_matches_column_path.
    """
    nts, css, shs = [], [], []
    for t in texts:
        if t is None:
            nts.append(None)
            css.append(None)
            shs.append(None)
            continue
        toks = _JAVA_WS.split(t.strip(" ").lower())
        nts.append(len(toks))
        css.append(sum(len(x) for x in toks))
        shs.append(sum(1 for x in toks if x in _STOPWORDS))
    return pd.DataFrame({
        "nt": pd.array(nts, dtype="Int32"),
        "cs": pd.array(css, dtype="Int64"),
        "sh": pd.array(shs, dtype="Int32"),
    })
