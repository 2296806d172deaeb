"""MySQL-%% and Joda datetime pattern → java.time translation.

Presto has two datetime-format dialects (reference:
presto-main-base/.../operator/scalar/DateTimeFunctions.java:71 area):

* ``date_format`` / ``date_parse`` use MySQL ``%``-specifiers
  (DateTimeFunctions.java dateFormat/dateParse, ``@ScalarFunction``
  registrations near the bottom of the file);
* ``format_datetime`` / ``parse_datetime`` use Joda-Time patterns
  (DateTimeFunctions.java formatDatetime/parseDatetime).

Spark's ``date_format``/``to_timestamp`` speak java.time
DateTimeFormatter, so both dialects need translating.  The translators
here are pure string→string and are applied by functions/dialect.py when
the pattern argument is a string literal (the overwhelmingly common
case); non-literal patterns are a documented limitation.

Semantic notes:

* In the MySQL dialect every non-``%`` character is a literal —
  including letters.  java.time treats bare letters as pattern fields,
  so literal runs containing letters are emitted single-quoted.
* Week-based fields (``%v``/``%x``/``%U``/``%u``/``%V``/``%X``/``%w``,
  Joda ``x``/``w``/``ww``) are rejected: Spark ≥3 refuses week-based
  pattern letters (Y/w/W) outright.  We raise ``UnsupportedPatternError``
  and the dialect layer leaves the call untranslated so the failure is
  loud, mirroring Presto's own "not supported" errors for %D/%U/%u/%V/%w/%X
  (DateTimeFunctions.java checkState in dateFormat).
"""

from __future__ import annotations


class UnsupportedPatternError(ValueError):
    """Pattern uses a field with no Spark-side equivalent."""


# MySQL %-specifier → java.time fragment (None = unsupported).
_MYSQL = {
    "a": "EEE",        # abbreviated weekday name
    "b": "MMM",        # abbreviated month name
    "c": "M",          # month 1..12, no pad
    "d": "dd",         # day of month, 2-digit
    "e": "d",          # day of month, no pad
    "f": "SSSSSS",     # fraction of second (micros)
    "H": "HH",         # hour 00..23
    "h": "hh",         # hour 01..12
    "I": "hh",         # hour 01..12 (MySQL synonym)
    "i": "mm",         # minutes
    "j": "DDD",        # day of year, 3-digit
    "k": "H",          # hour 0..23, no pad
    "l": "h",          # hour 1..12, no pad
    "M": "MMMM",       # full month name
    "m": "MM",         # month, 2-digit
    "p": "a",          # AM/PM
    "r": "hh:mm:ss a",  # 12-hour time
    "S": "ss",         # seconds
    "s": "ss",         # seconds
    "T": "HH:mm:ss",   # 24-hour time
    "W": "EEEE",       # full weekday name
    "Y": "yyyy",       # year, 4-digit
    "y": "yy",         # year, 2-digit
    # week-based / unsupported-by-Spark (or by Presto itself):
    "v": None, "x": None, "V": None, "X": None,
    "U": None, "u": None, "w": None, "D": None,
}


def _flush_literal(out: list[str], lit: list[str]) -> None:
    if not lit:
        return
    run = "".join(lit)
    lit.clear()
    if any(c.isalpha() or c == "'" for c in run):
        out.append("'" + run.replace("'", "''") + "'")
    else:
        out.append(run)


def mysql_to_java(pattern: str) -> str:
    """Translate a MySQL ``%``-pattern to a java.time pattern."""
    out: list[str] = []
    lit: list[str] = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "%" and i + 1 < len(pattern):
            spec = pattern[i + 1]
            i += 2
            if spec == "%":
                lit.append("%")
                continue
            mapped = _MYSQL.get(spec)
            if mapped is None:
                if spec in _MYSQL:
                    raise UnsupportedPatternError(
                        f"%{spec} has no Spark equivalent (week-based field)")
                # MySQL: unrecognized %x renders x literally
                lit.append(spec)
                continue
            _flush_literal(out, lit)
            out.append(mapped)
        else:
            lit.append(c)
            i += 1
    _flush_literal(out, lit)
    return "".join(out)


def joda_to_java(pattern: str) -> str:
    """Translate a Joda-Time pattern to java.time.

    Joda and java.time agree on most letters; the deltas handled here:
    ``Y`` (Joda year-of-era → java.time ``y``; java.time's ``Y`` is
    week-based and Spark rejects it), ``ZZ`` (offset with colon →
    ``xxx``), ``x`` (Joda weekyear → unsupported), ``w``/``ww`` (week
    of weekyear → unsupported in Spark).  Quoted literal sections pass
    through untouched.
    """
    out: list[str] = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "'":  # quoted literal — copy through to closing quote
            j = i + 1
            while j < n:
                if pattern[j] == "'":
                    if j + 1 < n and pattern[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(pattern[i:j + 1])
            i = j + 1
            continue
        if c.isalpha():
            j = i
            while j < n and pattern[j] == c:
                j += 1
            run = j - i
            if c == "Y":
                out.append("y" * run)
            elif c == "Z":
                out.append("xxx" if run >= 2 else "Z")
            elif c in ("x", "w"):
                raise UnsupportedPatternError(
                    f"Joda '{c}' (week-based) has no Spark equivalent")
            else:
                out.append(c * run)
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)
