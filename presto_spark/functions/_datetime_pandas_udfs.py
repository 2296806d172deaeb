"""Arrow-batched pandas UDFs for NON-LITERAL datetime format patterns.

Module WITHOUT ``from __future__ import annotations`` (pandas_udf needs
live type hints — same convention as _json_pandas_udfs.py).

Presto evaluates format patterns per row (DateTimeFunctions.java
dateFormat/formatDatetime take the pattern as a Slice argument — nothing
requires it constant).  The dialect layer translates literal patterns to
java.time and stays JVM-side; when the pattern is a column expression it
routes here instead (functions/dialect.py _rewrite_datetime_formats), so
column-valued patterns get MySQL/Joda semantics rather than silently
falling through to Spark's java.time interpretation.

Rendering is direct field emission (no strftime) so the output matches
the java.time path exactly for the supported subset, including the ISO
week fields the literal concat-lowering supports (%v/%x via
_mysql_concat_form, Joda w/x via _joda_concat_form — rendered here with
isocalendar(), the same ISO-8601 week numbering).  Fields Presto itself
rejects (MySQL %V/%X/%U/%u/%w/%D — DateTimeFunctions.java:1045 area —
and unmapped Joda letters) yield NULL, the engine's pinned
null-on-error posture.
"""

import datetime
from functools import lru_cache

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DateType, StringType, TimestampNTZType

_WD_ABBR = ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]
_WD_FULL = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]
_MON_ABBR = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug",
             "Sep", "Oct", "Nov", "Dec"]
_MON_FULL = ["January", "February", "March", "April", "May", "June",
             "July", "August", "September", "October", "November",
             "December"]


def _h12(hour: int) -> int:
    return 12 if hour % 12 == 0 else hour % 12


class _Unsupported(Exception):
    pass


def render_mysql(dt: datetime.datetime, pattern: str) -> str:
    """Format ``dt`` with a MySQL %%-pattern (same field set as
    datetime_formats._MYSQL; week-based specifiers raise)."""
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c != "%" or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        spec = pattern[i + 1]
        i += 2
        if spec == "%":
            out.append("%")
        elif spec == "a":
            out.append(_WD_ABBR[dt.weekday()])
        elif spec == "b":
            out.append(_MON_ABBR[dt.month - 1])
        elif spec == "c":
            out.append(str(dt.month))
        elif spec == "d":
            out.append(f"{dt.day:02d}")
        elif spec == "e":
            out.append(str(dt.day))
        elif spec == "f":
            out.append(f"{dt.microsecond:06d}")
        elif spec == "H":
            out.append(f"{dt.hour:02d}")
        elif spec in ("h", "I"):
            out.append(f"{_h12(dt.hour):02d}")
        elif spec == "i":
            out.append(f"{dt.minute:02d}")
        elif spec == "j":
            out.append(f"{dt.timetuple().tm_yday:03d}")
        elif spec == "k":
            out.append(str(dt.hour))
        elif spec == "l":
            out.append(str(_h12(dt.hour)))
        elif spec == "M":
            out.append(_MON_FULL[dt.month - 1])
        elif spec == "m":
            out.append(f"{dt.month:02d}")
        elif spec == "p":
            out.append("AM" if dt.hour < 12 else "PM")
        elif spec == "r":
            out.append(f"{_h12(dt.hour):02d}:{dt.minute:02d}:{dt.second:02d} "
                       + ("AM" if dt.hour < 12 else "PM"))
        elif spec in ("S", "s"):
            out.append(f"{dt.second:02d}")
        elif spec == "T":
            out.append(f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d}")
        elif spec == "W":
            out.append(_WD_FULL[dt.weekday()])
        elif spec == "Y":
            out.append(f"{dt.year:04d}")
        elif spec == "y":
            out.append(f"{dt.year % 100:02d}")
        elif spec == "v":
            out.append(f"{dt.isocalendar()[1]:02d}")
        elif spec == "x":
            out.append(f"{dt.isocalendar()[0]:04d}")
        elif spec in "VXUuwD":
            raise _Unsupported(spec)
        else:
            out.append(spec)  # MySQL renders unknown %x as the bare char
    return "".join(out)


def render_joda(dt: datetime.datetime, pattern: str) -> str:
    """Format ``dt`` with a Joda pattern (letter runs; quoted literals)."""
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(pattern[j])
                j += 1
            out.append("".join(buf) if buf else "'")
            i = j + 1
            continue
        if not c.isalpha():
            out.append(c)
            i += 1
            continue
        j = i
        while j < n and pattern[j] == c:
            j += 1
        run = j - i
        i = j
        if c in ("y", "Y"):
            out.append(f"{dt.year % 100:02d}" if run == 2
                       else str(dt.year).zfill(run))
        elif c == "M":
            out.append(_MON_FULL[dt.month - 1] if run >= 4
                       else _MON_ABBR[dt.month - 1] if run == 3
                       else str(dt.month).zfill(run))
        elif c == "d":
            out.append(str(dt.day).zfill(run))
        elif c == "H":
            out.append(str(dt.hour).zfill(run))
        elif c == "h":
            out.append(str(_h12(dt.hour)).zfill(run))
        elif c == "m":
            out.append(str(dt.minute).zfill(run))
        elif c == "s":
            out.append(str(dt.second).zfill(run))
        elif c == "S":
            out.append(f"{dt.microsecond:06d}"[:run].ljust(run, "0"))
        elif c == "a":
            out.append("AM" if dt.hour < 12 else "PM")
        elif c == "E":
            out.append(_WD_FULL[dt.weekday()] if run >= 4
                       else _WD_ABBR[dt.weekday()])
        elif c == "D":
            out.append(str(dt.timetuple().tm_yday).zfill(run))
        elif c == "w":
            out.append(str(dt.isocalendar()[1]).zfill(run))
        elif c == "x":
            out.append(str(dt.isocalendar()[0]).zfill(run))
        else:
            raise _Unsupported(c)
    return "".join(out)


@lru_cache(maxsize=512)
def _mysql_to_strptime(pattern: str) -> str:
    _MAP = {"a": "%a", "b": "%b", "c": "%m", "d": "%d", "e": "%d",
            "f": "%f", "H": "%H", "h": "%I", "I": "%I", "i": "%M",
            "j": "%j", "k": "%H", "l": "%I", "M": "%B", "m": "%m",
            "p": "%p", "r": "%I:%M:%S %p", "S": "%S", "s": "%S",
            "T": "%H:%M:%S", "W": "%A", "Y": "%Y", "y": "%y"}
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "%" and i + 1 < len(pattern):
            spec = pattern[i + 1]
            i += 2
            if spec == "%":
                out.append("%%")
            elif spec in _MAP:
                out.append(_MAP[spec])
            elif spec in "vxVXUuwD":
                raise _Unsupported(spec)
            else:
                out.append(spec)
        else:
            out.append("%%" if c == "%" else c)
            i += 1
    return "".join(out)


@lru_cache(maxsize=512)
def _joda_to_strptime(pattern: str) -> str:
    _RUNS = {("y", 2): "%y", ("Y", 2): "%y", ("M", 3): "%b", ("M", 4): "%B",
             ("E", 3): "%a", ("E", 4): "%A"}
    _LETTER = {"y": "%Y", "Y": "%Y", "M": "%m", "d": "%d", "H": "%H",
               "h": "%I", "m": "%M", "s": "%S", "S": "%f", "a": "%p",
               "D": "%j"}
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "'":
            j = i + 1
            while j < n and pattern[j] != "'":
                out.append("%%" if pattern[j] == "%" else pattern[j])
                j += 1
            i = j + 1
            continue
        if not c.isalpha():
            out.append("%%" if c == "%" else c)
            i += 1
            continue
        j = i
        while j < n and pattern[j] == c:
            j += 1
        run = j - i
        i = j
        if (c, min(run, 4)) in _RUNS:
            out.append(_RUNS[(c, min(run, 4))])
        elif c in _LETTER:
            out.append(_LETTER[c])
        else:
            raise _Unsupported(c)
    return "".join(out)


def _as_dt(v):
    if v is None or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day)
    return None


def _fmt_series(render, ts: pd.Series, pat: pd.Series) -> pd.Series:
    def one(t, p):
        t = _as_dt(t)
        if t is None or p is None or pd.isna(p):
            return None
        try:
            return render(t, p)
        except _Unsupported:
            return None
    return pd.Series([one(t, p) for t, p in zip(ts, pat)], dtype="object")


def _parse_series(xlate, s: pd.Series, pat: pd.Series) -> pd.Series:
    def one(v, p):
        if v is None or p is None or pd.isna(v) or pd.isna(p):
            return None
        try:
            return datetime.datetime.strptime(v, xlate(p))
        except (_Unsupported, ValueError):
            return None
    return pd.Series([one(v, p) for v, p in zip(s, pat)], dtype="object")


@pandas_udf(StringType())
def date_format_py(ts: pd.Series, pat: pd.Series) -> pd.Series:
    return _fmt_series(render_mysql, ts, pat)


@pandas_udf(StringType())
def format_datetime_py(ts: pd.Series, pat: pd.Series) -> pd.Series:
    return _fmt_series(render_joda, ts, pat)


@pandas_udf(TimestampNTZType())
def date_parse_py(s: pd.Series, pat: pd.Series) -> pd.Series:
    return _parse_series(_mysql_to_strptime, s, pat)


@pandas_udf(TimestampNTZType())
def parse_datetime_py(s: pd.Series, pat: pd.Series) -> pd.Series:
    return _parse_series(_joda_to_strptime, s, pat)


# ---- Teradata format grammar, per-row (TeradataDateFunctions.java
# compiles the format per value at runtime — nothing requires it
# constant; dateformat/DateFormatParser.java token set).  Literal
# formats stay JVM-side via teradata.literal_format_to_java; the
# dialect layer routes column-valued formats here (ADVICE r5: the
# macros used to raise inside translate()).

import re as _re

_TD_TOKEN_RE = _re.compile(
    r"yyyy|yy|hh24|hh|mm|mi|dd|ss|[A-Za-z]+|[^A-Za-z]+", _re.IGNORECASE
)


def render_teradata(dt: datetime.datetime, pattern: str) -> str:
    out = []
    for m in _TD_TOKEN_RE.finditer(pattern):
        t = m.group(0).lower()
        if t == "yyyy":
            out.append(f"{dt.year:04d}")
        elif t == "yy":
            out.append(f"{dt.year % 100:02d}")
        elif t == "hh24":
            out.append(f"{dt.hour:02d}")
        elif t == "hh":  # HOUR_OF_AMPM 0-11 (KK in the literal path)
            out.append(f"{dt.hour % 12:02d}")
        elif t == "mm":
            out.append(f"{dt.month:02d}")
        elif t == "mi":
            out.append(f"{dt.minute:02d}")
        elif t == "dd":
            out.append(f"{dt.day:02d}")
        elif t == "ss":
            out.append(f"{dt.second:02d}")
        elif _re.search(r"[A-Za-z]", t):
            raise _Unsupported(t)
        else:
            out.append(m.group(0))
    return "".join(out)


def parse_teradata(value: str, pattern: str) -> datetime.datetime:
    """1-2-digit-tolerant parse (DateFormatParser.java PARSER mode);
    'hh' accepts 0-11 and defaults to AM."""
    fields: list[str] = []
    rx = []
    for m in _TD_TOKEN_RE.finditer(pattern):
        t = m.group(0).lower()
        if t == "yyyy":
            rx.append(r"(\d{1,4})")
            fields.append("yyyy")
        elif t in ("yy", "hh24", "hh", "mm", "mi", "dd", "ss"):
            rx.append(r"(\d{1,2})")
            fields.append(t)
        elif _re.search(r"[A-Za-z]", t):
            raise _Unsupported(t)
        else:
            rx.append(_re.escape(m.group(0)))
    m = _re.fullmatch("".join(rx), value.strip())
    if m is None:
        raise ValueError(value)
    parts = {"year": 1970, "month": 1, "day": 1,
             "hour": 0, "minute": 0, "second": 0}
    for f, g in zip(fields, m.groups()):
        v = int(g)
        if f == "yyyy":
            parts["year"] = v
        elif f == "yy":
            parts["year"] = 2000 + v  # appendValueReduced(YEAR, 2, 2, 2000)
        elif f == "hh24":
            parts["hour"] = v
        elif f == "hh":
            if v > 11:
                raise ValueError(value)
            parts["hour"] = v  # AM default
        elif f == "mm":
            parts["month"] = v
        elif f == "mi":
            parts["minute"] = v
        elif f == "dd":
            parts["day"] = v
        elif f == "ss":
            parts["second"] = v
    return datetime.datetime(**parts)


def _td_parse_series(s: pd.Series, pat: pd.Series) -> pd.Series:
    def one(v, p):
        if v is None or p is None or pd.isna(v) or pd.isna(p):
            return None
        try:
            return parse_teradata(v, p)
        except (_Unsupported, ValueError):
            return None
    return pd.Series([one(v, p) for v, p in zip(s, pat)], dtype="object")


@pandas_udf(StringType())
def to_char_td_py(ts: pd.Series, pat: pd.Series) -> pd.Series:
    return _fmt_series(render_teradata, ts, pat)


@pandas_udf(TimestampNTZType())
def to_timestamp_td_py(s: pd.Series, pat: pd.Series) -> pd.Series:
    return _td_parse_series(s, pat)


@pandas_udf(DateType())
def to_date_td_py(s: pd.Series, pat: pd.Series) -> pd.Series:
    out = _td_parse_series(s, pat)
    return pd.Series(
        [None if v is None else v.date() for v in out], dtype="object"
    )
