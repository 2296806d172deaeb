"""Incomplete-integral CDF family (MathFunctions.java parity).

Reference: Presto ships beta_cdf / binomial_cdf / chi_squared_cdf /
f_cdf / gamma_cdf / poisson_cdf / inverse_beta_cdf backed by Apache
commons-math distributions (presto-main-base/.../scalar/
MathFunctions.java).  The closed-form CDFs (cauchy/laplace/logistic/
weibull/normal) are JVM-side SQL shims in registry.py; the ones here
need the regularized incomplete gamma P(a,x) and beta I_x(a,b), which
have no closed form — implemented with the standard series /
modified-Lentz continued-fraction algorithms (Abramowitz & Stegun
§6.5/§26.5; the textbook formulas every numerics library uses),
converging to ~1e-15.

Identities used:

* chi_squared_cdf(k, x)  = P(k/2, x/2)
* gamma_cdf(shape, scale, x) = P(shape, x/scale)
* poisson_cdf(lambda, k) = 1 - P(k+1, lambda)
* binomial_cdf(n, p, k)  = I_{1-p}(n-k, k+1)
* beta_cdf(a, b, x)      = I_x(a, b)
* f_cdf(d1, d2, x)       = I_y(d1/2, d2/2),  y = d1·x / (d1·x + d2)
"""

from __future__ import annotations

import math

_TINY = 1e-300
_EPS = 1e-15
_MAX_ITER = 500


def gammainc_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if math.isnan(a) or math.isnan(x) or a <= 0 or x < 0:
        return float("nan")
    if x == 0:
        return 0.0
    if x < a + 1.0:
        # series representation
        ap = a
        term = total = 1.0 / a
        for _ in range(_MAX_ITER):
            ap += 1.0
            term *= x / ap
            total += term
            if abs(term) < abs(total) * _EPS:
                break
        return total * math.exp(-x + a * math.log(x) - math.lgamma(a))
    # continued fraction for Q(a, x), modified Lentz
    b = x + 1.0 - a
    c = 1.0 / _TINY
    d = 1.0 / b
    h = d
    for i in range(1, _MAX_ITER + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < _TINY:
            d = _TINY
        c = b + an / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    q = math.exp(-x + a * math.log(x) - math.lgamma(a)) * h
    return 1.0 - q


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (modified Lentz)."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < _TINY:
        d = _TINY
    d = 1.0 / d
    h = d
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < _TINY:
            d = _TINY
        c = 1.0 + aa / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < _TINY:
            d = _TINY
        c = 1.0 + aa / c
        if abs(c) < _TINY:
            c = _TINY
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < _EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if math.isnan(a) or math.isnan(b) or math.isnan(x) or a <= 0 or b <= 0:
        return float("nan")
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    front = math.exp(
        a * math.log(x) + b * math.log(1.0 - x)
        - (math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b))
    )
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


# ---- Presto-signature CDFs (MathFunctions.java argument orders) ----

def beta_cdf(a: float, b: float, v: float) -> float:
    return betainc(a, b, v)


def chi_squared_cdf(df: float, v: float) -> float:
    if df <= 0 or v < 0:
        return float("nan")
    return gammainc_p(df / 2.0, v / 2.0)


def gamma_cdf(shape: float, scale: float, v: float) -> float:
    if shape <= 0 or scale <= 0 or v < 0:
        return float("nan")
    return gammainc_p(shape, v / scale)


def poisson_cdf(lam: float, k: float) -> float:
    if lam <= 0 or k < 0:
        return float("nan")
    return 1.0 - gammainc_p(math.floor(k) + 1.0, lam)


def binomial_cdf(n: float, p: float, k: float) -> float:
    if n < 0 or not (0.0 <= p <= 1.0):
        return float("nan")
    k = math.floor(k)
    if k < 0:
        return 0.0
    if k >= n:
        return 1.0
    return betainc(n - k, k + 1.0, 1.0 - p)


def f_cdf(d1: float, d2: float, v: float) -> float:
    if d1 <= 0 or d2 <= 0 or v < 0:
        return float("nan")
    y = d1 * v / (d1 * v + d2)
    return betainc(d1 / 2.0, d2 / 2.0, y)


def inverse_beta_cdf(a: float, b: float, p: float) -> float:
    """Quantile of Beta(a, b) by bisection on betainc (monotone)."""
    if not (0.0 <= p <= 1.0) or a <= 0 or b <= 0:
        return float("nan")
    if p == 0.0:
        return 0.0
    if p == 1.0:
        return 1.0
    lo, hi = 0.0, 1.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if betainc(a, b, mid) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-16:
            break
    return 0.5 * (lo + hi)


def t_cdf(df: float, t: float) -> float:
    """Student's t CDF via the incomplete beta identity
    (MathFunctions.java tCdf): P(T<=t) = 1 - I_x(df/2, 1/2)/2 for t>0,
    x = df/(df+t²); symmetric for t<0."""
    if df <= 0 or math.isnan(t):
        return float("nan")
    if t == 0:
        return 0.5
    x = df / (df + t * t)
    tail = 0.5 * betainc(df / 2.0, 0.5, x)
    return 1.0 - tail if t > 0 else tail


def _invert_continuous(cdf, p: float, lo: float, hi: float) -> float:
    """Bisection quantile for a monotone CDF on [lo, hi) with geometric
    upper-bound growth."""
    if not (0.0 <= p <= 1.0):
        return float("nan")
    if p == 0.0:
        return lo
    while cdf(hi) < p and hi < 1e300:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if cdf(mid) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-12 * max(1.0, abs(hi)):
            break
    return 0.5 * (lo + hi)


def inverse_chi_squared_cdf(df: float, p: float) -> float:
    if df <= 0:
        return float("nan")
    return _invert_continuous(lambda x: chi_squared_cdf(df, x), p, 0.0, df + 10.0)


def inverse_gamma_cdf(shape: float, scale: float, p: float) -> float:
    if shape <= 0 or scale <= 0:
        return float("nan")
    return _invert_continuous(
        lambda x: gamma_cdf(shape, scale, x), p, 0.0, shape * scale + 10.0
    )


def inverse_f_cdf(d1: float, d2: float, p: float) -> float:
    if d1 <= 0 or d2 <= 0:
        return float("nan")
    return _invert_continuous(lambda x: f_cdf(d1, d2, x), p, 0.0, 10.0)


def inverse_t_cdf(df: float, p: float) -> float:
    if df <= 0 or not (0.0 < p < 1.0):
        return float("nan")
    if p == 0.5:
        return 0.0
    if p < 0.5:
        return -inverse_t_cdf(df, 1.0 - p)
    hi = 10.0
    while t_cdf(df, hi) < p and hi < 1e300:
        hi *= 2.0
    lo = 0.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(df, mid) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo <= 1e-12 * max(1.0, hi):
            break
    return 0.5 * (lo + hi)


def inverse_poisson_cdf(lam: float, p: float) -> int:
    """Smallest k with poisson_cdf(lam, k) >= p (discrete quantile)."""
    if lam <= 0 or not (0.0 <= p < 1.0):
        return -1  # Presto raises; NULL-signal handled by the UDF layer
    k = 0
    while poisson_cdf(lam, k) < p and k < 10_000_000:
        k += max(1, int(0.1 * max(lam, 1)))
    while k > 0 and poisson_cdf(lam, k - 1) >= p:
        k -= 1
    return k


def inverse_binomial_cdf(n: float, prob: float, p: float) -> int:
    if n < 0 or not (0.0 <= prob <= 1.0) or not (0.0 <= p < 1.0):
        return -1
    k = 0
    n = int(n)
    while k < n and binomial_cdf(n, prob, k) < p:
        k += 1
    return k
