"""Arrow-batched pandas UDFs for the incomplete-integral CDF family.

Module WITHOUT ``from __future__ import annotations`` (pandas_udf needs
live type hints).  Scalar math in functions/stats.py; these wrappers
map it over Arrow batches.  CDF calls are analytics-tail expressions
(confidence tests, p-values), never scan-hot paths, so the Python tier
is the right cost point — same reasoning as the JSONPath fallback.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from presto_spark.functions import stats


def _map3(fn, a: pd.Series, b: pd.Series, c: pd.Series) -> pd.Series:
    # pd.isna, not `is None`: NULL DOUBLEs arrive in a float64 Series as
    # NaN.  float() coercion: SQL DECIMAL literals arrive as Decimal.
    return pd.Series(
        [
            None if pd.isna(x) or pd.isna(y) or pd.isna(z)
            else fn(float(x), float(y), float(z))
            for x, y, z in zip(a, b, c)
        ],
        dtype="float64",
    )


def _map2(fn, a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if pd.isna(x) or pd.isna(y) else fn(float(x), float(y))
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


def _null_on_sentinel(v):
    """The discrete inverse CDFs return -1 where Presto raises (stats.py
    inverse_poisson/binomial); surface that as NULL — the TRY()-wrapped
    behavior users reach for.  Only applied to those two UDFs: -1 is a
    legal quantile for the continuous inverses (e.g. inverse_t_cdf).

    DELIBERATE RELAXATION vs the reference: Presto throws
    INVALID_FUNCTION_ARGUMENT for invalid lambda/p OUTSIDE TRY()
    (MathFunctions.java inversePoissonCdf checkCondition); this engine
    returns NULL in both contexts — consistent with its non-ANSI
    null-on-error posture (div-by-zero, bad subscripts) and pinned in
    tests/test_semantics.py."""
    return None if v == -1 else float(v)


@pandas_udf(DoubleType())
def beta_cdf_udf(a: pd.Series, b: pd.Series, v: pd.Series) -> pd.Series:
    return _map3(stats.beta_cdf, a, b, v)


@pandas_udf(DoubleType())
def binomial_cdf_udf(n: pd.Series, p: pd.Series, k: pd.Series) -> pd.Series:
    return _map3(stats.binomial_cdf, n, p, k)


@pandas_udf(DoubleType())
def chi_squared_cdf_udf(df: pd.Series, v: pd.Series) -> pd.Series:
    return _map2(stats.chi_squared_cdf, df, v)


@pandas_udf(DoubleType())
def f_cdf_udf(d1: pd.Series, d2: pd.Series, v: pd.Series) -> pd.Series:
    return _map3(stats.f_cdf, d1, d2, v)


@pandas_udf(DoubleType())
def gamma_cdf_udf(shape: pd.Series, scale: pd.Series, v: pd.Series) -> pd.Series:
    return _map3(stats.gamma_cdf, shape, scale, v)


@pandas_udf(DoubleType())
def poisson_cdf_udf(lam: pd.Series, k: pd.Series) -> pd.Series:
    return _map2(stats.poisson_cdf, lam, k)


@pandas_udf(DoubleType())
def inverse_beta_cdf_udf(a: pd.Series, b: pd.Series, p: pd.Series) -> pd.Series:
    return _map3(stats.inverse_beta_cdf, a, b, p)


@pandas_udf(DoubleType())
def t_cdf_udf(df: pd.Series, t: pd.Series) -> pd.Series:
    return _map2(stats.t_cdf, df, t)


@pandas_udf(DoubleType())
def inverse_t_cdf_udf(df: pd.Series, p: pd.Series) -> pd.Series:
    return _map2(stats.inverse_t_cdf, df, p)


@pandas_udf(DoubleType())
def inverse_chi_squared_cdf_udf(df: pd.Series, p: pd.Series) -> pd.Series:
    return _map2(stats.inverse_chi_squared_cdf, df, p)


@pandas_udf(DoubleType())
def inverse_gamma_cdf_udf(sh: pd.Series, sc: pd.Series, p: pd.Series) -> pd.Series:
    return _map3(stats.inverse_gamma_cdf, sh, sc, p)


@pandas_udf(DoubleType())
def inverse_f_cdf_udf(d1: pd.Series, d2: pd.Series, p: pd.Series) -> pd.Series:
    return _map3(stats.inverse_f_cdf, d1, d2, p)


@pandas_udf(DoubleType())
def inverse_poisson_cdf_udf(lam: pd.Series, p: pd.Series) -> pd.Series:
    return _map2(
        lambda a, b: _null_on_sentinel(stats.inverse_poisson_cdf(a, b)), lam, p
    )


@pandas_udf(DoubleType())
def inverse_binomial_cdf_udf(n: pd.Series, pr: pd.Series, p: pd.Series) -> pd.Series:
    return _map3(
        lambda a, b, c: _null_on_sentinel(stats.inverse_binomial_cdf(a, b, c)),
        n, pr, p,
    )
