"""Arrow-batched pandas UDFs for text functions.

Module WITHOUT ``from __future__ import annotations`` (pandas_udf needs
live type hints — same convention as llm/_pandas_udfs.py).
"""

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType, StringType

from presto_spark.functions.porter import stem


@pandas_udf(StringType())
def word_stem_udf(w: pd.Series) -> pd.Series:
    """word_stem(w) — full Porter algorithm (WordStemFunction.java)."""
    return w.map(lambda x: stem(x) if x is not None else None)


def _jaro_winkler(s1, s2):
    """Jaro-Winkler similarity (JaroWinklerFunction.java — the standard
    published algorithm: Jaro similarity + up-to-4-char prefix boost)."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    jaro = (matches / l1 + matches / l2 + (matches - t / 2) / matches) / 3
    # Prefix boost only above the 0.7 Jaro threshold
    # (JaroWinklerFunction / commons-text JARO_WINKLER_THRESHOLD).
    # The reference rounds UNCONDITIONALLY (StringFunctions.java:838),
    # so the low-similarity branch rounds too.
    if jaro <= 0.7:
        return math.floor(jaro * 100.0 + 0.5) / 100.0
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    jw = jaro + prefix * 0.1 * (1 - jaro)
    # Presto rounds the final similarity to 2 decimals
    # (StringFunctions.java: Math.round(jaroWinkler * 100.0d) / 100.0d);
    # floor(x*100 + 0.5) matches Java Math.round, not Python banker's.
    return math.floor(jw * 100.0 + 0.5) / 100.0


@pandas_udf(DoubleType())
def jarowinkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if x is None or y is None else _jaro_winkler(x, y)
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


@pandas_udf(StringType())
def normalize_udf(s: pd.Series, form: pd.Series) -> pd.Series:
    """normalize(s, form) — NFC/NFD/NFKC/NFKD (StringFunctions.java
    normalize; unicodedata is the same Unicode normalization spec)."""
    import unicodedata

    return pd.Series(
        [
            None if x is None or f is None
            else unicodedata.normalize(f.upper(), x)
            for x, f in zip(s, form)
        ],
        dtype="object",
    )
