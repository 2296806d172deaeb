"""Differential replay of the reference's semantic test corpus.

The reference's workhorse end-to-end suite is
presto-tests/src/main/java/com/facebook/presto/tests/
AbstractTestQueries.java (+ the Aggregations/Window/Join/OrderBy
siblings): hundreds of ``assertQuery("SQL")`` calls that run the SAME
text on Presto and on the H2 oracle and diff the results
(QueryAssertions.java:132).  This module extracts every call whose
arguments are pure string literals and replays it here: the query on
Engine.sql (Presto dialect), the oracle text on DuckDB, over the SAME
relations (the driver parquet under the presto-tpch connector's
unprefixed column names, NULL-padded to the full spec) — exactly the
reference's own differential protocol with DuckDB standing in for H2.

Because both engines read identical data, the airlift-vs-driver value
difference is irrelevant: this checks SEMANTICS (grammar, functions,
joins, aggregation, null handling), which is what the reference used
these tests for.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

REFERENCE_TESTS_DIR = (
    "/root/reference/presto-tests/src/main/java/com/facebook/presto/tests"
)
SOURCE_FILES = (
    "AbstractTestQueries.java",
    "AbstractTestAggregations.java",
    "AbstractTestWindowQueries.java",
    "AbstractTestJoinQueries.java",
    "AbstractTestOrderByQueries.java",
)

_CALL_RE = re.compile(r"\bassertQuery(Ordered)?\s*\(")
_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _java_unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "u" and i + 5 < len(body):
                out.append(chr(int(body[i + 2:i + 6], 16)))
                i += 6
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _scan_call(src: str, open_paren: int) -> tuple[str, int] | None:
    """Return (argument text, index after close paren) for the call
    whose '(' is at open_paren, honoring Java string literals."""
    depth = 0
    i = open_paren
    in_str = False
    while i < len(src):
        c = src[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return src[open_paren + 1:i], i + 1
        i += 1
    return None


_LITERAL_ARGS_RE = re.compile(
    r'^\s*"(?:[^"\\]|\\.)*"(?:\s*\+\s*"(?:[^"\\]|\\.)*")*\s*$'
)


def _split_top_level_args(argtext: str) -> list[str]:
    args, depth, start, in_str, i = [], 0, 0, False, 0
    while i < len(argtext):
        c = argtext[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(argtext[start:i])
            start = i + 1
        i += 1
    args.append(argtext[start:])
    return args


def _literal_value(arg: str) -> str | None:
    """A pure Java string-literal concatenation → its value; else None."""
    if not _LITERAL_ARGS_RE.match(arg):
        return None
    pieces = re.findall(r'"((?:[^"\\]|\\.)*)"', arg)
    return _java_unescape("".join(pieces))


# -- round 11 (VERDICT r10 next-round #7): partial evaluation of the
#    two big recoverable non-literal classes --------------------------------

_IDENT_ARG_RE = re.compile(r"^\s*\w+\s*$")

# -- round 12 (VERDICT r11 next-round #8): EXECUTE recovery ----------------
#
# The reference's EXECUTE tests hold the prepared text in the Java
# Session (``Session.builder()...addPreparedStatement("my_query",
# <literal-or-local-String-var>)``) right above the assertQuery call.
# The text IS recoverable from the source: find the nearest preceding
# addPreparedStatement for the EXECUTE'd name, resolve its second
# argument (string literal, or a local ``String x = "...";``), and
# bind the USING arguments positionally into the ?s — producing the
# SELECT both engines can run directly.  Unrecoverable forms stay in
# the non_literal skip bucket (never silently green).

_EXECUTE_SQL_RE = re.compile(
    r"^\s*EXECUTE\s+(\w+)\s*(?:USING\s+(.+))?$",
    re.IGNORECASE | re.DOTALL)
_PREP_CALL_RE = re.compile(r"\.addPreparedStatement\s*\(")


def _local_string_var(src: str, before: int, ident: str) -> str | None:
    """Nearest preceding ``String <ident> = <literal-concat>;`` value."""
    pat = re.compile(r"String\s+" + re.escape(ident) + r"\s*=\s*")
    last = None
    for m in pat.finditer(src, 0, before):
        last = m
    if last is None:
        return None
    i, depth, in_str = last.end(), 0, False
    start = i
    while i < len(src):
        c = src[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == ";" and depth == 0:
            return _literal_value(src[start:i])
        i += 1
    return None


def _bind_positional(text: str, args: list[str]) -> str | None:
    """Replace each top-level ``?`` in the prepared SQL with the
    corresponding USING argument (parenthesized); ?s inside SQL string
    literals are data.  None on arity mismatch."""
    out: list[str] = []
    i, ai, in_str = 0, 0, False
    while i < len(text):
        c = text[i]
        if in_str:
            out.append(c)
            if c == "'":
                if i + 1 < len(text) and text[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if c == "'":
            in_str = True
        elif c == "?":
            if ai >= len(args):
                return None
            out.append("(" + args[ai].strip() + ")")
            ai += 1
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out) if ai == len(args) else None


def _recover_execute(src: str, call_start: int, sql: str) -> str | None:
    m = _EXECUTE_SQL_RE.match(sql)
    if not m:
        return None
    name, using = m.group(1), m.group(2)
    last = None
    for pm in _PREP_CALL_RE.finditer(src, 0, call_start):
        last = pm
    if last is None:
        return None
    parsed = _scan_call(src, last.end() - 1)
    if parsed is None:
        return None
    pargs = _split_top_level_args(parsed[0])
    if len(pargs) != 2 or _literal_value(pargs[0]) != name:
        return None
    text = _literal_value(pargs[1])
    if text is None and _IDENT_ARG_RE.match(pargs[1]):
        text = _local_string_var(src, last.start(), pargs[1].strip())
    if text is None:
        return None
    if using is None:
        return text if "?" not in text else None
    return _bind_positional(text, _split_top_level_args(using))


# 2-arg assertQuery(ident, literal) is ambiguous: the identifier can be
# a Session OR the SQL text itself (e.g. AbstractTestQueries.java:1849
# ``assertQuery(query, "VALUES ...")``) — dropping a SQL-text variable
# would collapse the case to a vacuous literal-vs-itself comparison
# (ADVICE r11).  Only identifiers that NAME a session are dropped in
# the 2-arg form; 3-arg calls are unambiguously (Session, sql, expected).
_SESSION_IDENT_RE = re.compile(r"^\s*\w*[sS]ession\w*\s*$")
_INT_ARG_RE = re.compile(r"^\s*-?\d+L?\s*$")
_FMT_CALL_RE = re.compile(r"^\s*format\s*\(", re.DOTALL)


def _format_eval(arg: str) -> str | None:
    """``format("...", <constants>)`` with a literal format string and
    literal/integer arguments, %s/%d specifiers only → the formatted
    value; else None.  This recovers the constant-argument format()
    calls the r10 extractor skipped."""
    m = _FMT_CALL_RE.match(arg)
    if not m:
        return None
    parsed = _scan_call(arg, arg.index("(", m.start()))
    if parsed is None or arg[parsed[1]:].strip():
        return None
    parts = _split_top_level_args(parsed[0])
    if not parts:
        return None
    fmt_v = _literal_value(parts[0])
    if fmt_v is None:
        return None
    vals: list[str] = []
    for p in parts[1:]:
        v = _literal_value(p)
        if v is None:
            if _INT_ARG_RE.match(p):
                v = p.strip().rstrip("L")
            else:
                return None
        vals.append(v)
    toks = re.split(r"(%%|%[A-Za-z])", fmt_v)
    out: list[str] = []
    vi = 0
    for tok in toks:
        if tok == "%%":
            out.append("%")
        elif tok in ("%s", "%d"):
            if vi >= len(vals):
                return None
            out.append(vals[vi])
            vi += 1
        elif tok.startswith("%") and len(tok) == 2:
            return None  # unsupported specifier
        else:
            out.append(tok)
    if vi != len(vals):
        return None
    return "".join(out)


def _resolved_value(arg: str) -> str | None:
    v = _literal_value(arg)
    return v if v is not None else _format_eval(arg)


# ---- shared catalog --------------------------------------------------------
#
# Both engines read the SAME relations: the driver parquet, renamed to
# the presto-tpch connector's unprefixed column names (TpchMetadata
# drops the per-table prefixes) and NULL-padded to the full spec —
# that is the schema AbstractTestQueries runs against.

from presto_spark.corpus.fixtures import TPCH_SPEC_COLUMNS  # noqa: E402

_FULL_SPEC = dict(TPCH_SPEC_COLUMNS)
_FULL_SPEC["nation"] = [
    ("n_nationkey", "BIGINT"), ("n_name", "STRING"),
    ("n_regionkey", "BIGINT"), ("n_comment", "STRING"),
]
_FULL_SPEC["region"] = [
    ("r_regionkey", "BIGINT"), ("r_name", "STRING"),
    ("r_comment", "STRING"),
]
_FULL_SPEC["partsupp"] = [
    ("ps_partkey", "BIGINT"), ("ps_suppkey", "BIGINT"),
    ("ps_availqty", "INT"), ("ps_supplycost", "DOUBLE"),
    ("ps_comment", "STRING"),
]
_PREFIX = {
    "nation": "n_", "region": "r_", "customer": "c_", "orders": "o_",
    "lineitem": "l_", "part": "p_", "supplier": "s_", "partsupp": "ps_",
}


def register_semantic_catalog(spark, duck, sf_dir: str) -> None:
    """Unprefixed spec-complete TPC-H views over the same parquet in
    BOTH engines (identical rows, identical NULL padding)."""
    import duckdb  # noqa: F401 — typing aid only

    for t, cols in _FULL_SPEC.items():
        pre = _PREFIX[t]
        parquet = os.path.join(sf_dir, f"{t}.parquet")
        have_spark = (set(spark.read.parquet(parquet).columns)
                      if os.path.exists(parquet) else set())

        def sel(engine: str) -> str:
            out = []
            for c, ty in cols:
                bare = c[len(pre):]
                if c in have_spark:
                    out.append(f"{c} AS {bare}")
                else:
                    dty = {"STRING": "VARCHAR"}.get(ty, ty) \
                        if engine == "duck" else ty
                    out.append(f"CAST(NULL AS {dty}) AS {bare}")
            return ", ".join(out)

        if have_spark:
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {t} AS "
                f"SELECT {sel('spark')} FROM parquet.`{parquet}`")
            duck.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT {sel('duck')} FROM '{parquet}'")
        else:
            # partsupp ships no parquet — empty on both sides
            empty_cols_s = ", ".join(
                f"CAST(NULL AS {ty}) AS {c[len(pre):]}" for c, ty in cols)
            empty_cols_d = ", ".join(
                f"CAST(NULL AS {'VARCHAR' if ty == 'STRING' else ty}) "
                f"AS {c[len(pre):]}" for c, ty in cols)
            spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {t} AS "
                      f"SELECT {empty_cols_s} WHERE 1 = 0")
            duck.execute(f"CREATE OR REPLACE VIEW {t} AS "
                         f"SELECT {empty_cols_d} WHERE 1 = 0")


# ---- runner ----------------------------------------------------------------

_LIMIT_RE = re.compile(r"\bLIMIT\s+\d", re.IGNORECASE)
_ORDER_RE = re.compile(r"\bORDER\s+BY\b", re.IGNORECASE)
_TABLES_RE = re.compile(
    r"\b(orders|lineitem|customer|nation|region|part|supplier|partsupp)\b",
    re.IGNORECASE)
# row_number/ntile break ties arbitrarily; the reference data has
# unique keys where the driver parquet may not, so the two engines
# can legitimately disagree — verified by row count only when the
# query reads tables.
_TIEBREAK_RE = re.compile(r"\b(row_number|ntile)\s*\(", re.IGNORECASE)
_NONDET_RE = re.compile(
    r"\b(rand|random|shuffle|uuid|arbitrary|any_value|current_time"
    r"|current_timestamp|now|localtime|approx_|reservoir)\w*\s*\(",
    re.IGNORECASE)


def canon(v):
    """Engine-neutral canonical value for multiset comparison."""
    import datetime
    import decimal
    import math
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v.is_integer() and abs(v) < 2**53:
            # numeric-width differences are engine artifacts here
            # (Presto/DuckDB integer division vs Spark's double `/`,
            # HUGEINT sums landing as floats) — unify whole numbers
            return int(v)
        return f"{v:.9g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, dict):
        return tuple(sorted((canon(k), canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # pyspark Row (struct cell)
        # positional, names dropped: Presto ROW equality is positional,
        # and DuckDB's unnamed row(...) arrives as a bare tuple — a
        # name-tagged canon could never match it (round 11; the
        # cast-to-row unnest cases)
        return tuple(canon(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


@dataclass
class SemanticOutcome:
    source: str
    status: str   # ok | fail | engine-error | oracle-unsupported | nondet-skip
    detail: str = ""


def run_semantic_case(spark, duck, case: "SemanticCase",
                      translate=None) -> SemanticOutcome:
    if _NONDET_RE.search(case.query):
        return SemanticOutcome(case.source, "nondet-skip",
                               "nondeterministic or engine-specific output")
    if translate is None:
        from presto_spark.functions.dialect import translate as translate
    reads_tables = bool(_TABLES_RE.search(case.query))
    count_only = bool(
        _LIMIT_RE.search(case.query) and not _ORDER_RE.search(case.query)
    ) or (reads_tables and _TIEBREAK_RE.search(case.query))
    try:
        actual = spark.sql(translate(case.query)).collect()
    except Exception as e:  # noqa: BLE001 — triaged by the caller
        return SemanticOutcome(case.source, "engine-error",
                               f"{type(e).__name__}: {str(e)[:200]}")
    if (case.oracle != case.query and reads_tables
            and not _TABLES_RE.search(case.oracle)):
        # the reference's expected side is a literal golden computed
        # over airlift-generated rows — unreproducible on the driver
        # parquet; the engine execution above is still required
        return SemanticOutcome(
            case.source, "data-literal-skip",
            "expected golden embeds generator-specific values")
    try:
        expected = duck.execute(case.oracle).fetchall()
    except Exception as e:  # noqa: BLE001
        return SemanticOutcome(case.source, "oracle-unsupported",
                               f"{type(e).__name__}: {str(e)[:120]}")
    if count_only:
        ok = len(actual) == len(expected)
        return SemanticOutcome(
            case.source, "ok" if ok else "fail",
            "" if ok else f"LIMIT rowcount {len(actual)} != {len(expected)}")
    a = [tuple(canon(v) for v in row) for row in actual]
    e = [tuple(canon(v) for v in row) for row in expected]
    if not case.ordered:
        a, e = sorted(a, key=repr), sorted(e, key=repr)
    if a == e:
        return SemanticOutcome(case.source, "ok")
    diff = next(((x, y) for x, y in zip(a, e) if x != y),
                (len(a), len(e)))
    return SemanticOutcome(case.source, "fail",
                           f"first diff: {str(diff)[:240]}")


@dataclass
class SemanticCase:
    source: str       # file:line of the assertQuery call
    query: str        # the engine-side SQL (Presto dialect)
    oracle: str       # the oracle-side SQL (same text for 1-arg calls)
    ordered: bool     # assertQueryOrdered


def extract_cases(tests_dir: str = REFERENCE_TESTS_DIR,
                  files: tuple[str, ...] = SOURCE_FILES
                  ) -> tuple[list[SemanticCase], int]:
    """All recoverable assertQuery[Ordered] cases, plus the count of
    calls still skipped because an argument was not resolvable.

    Round 11 widens recovery beyond pure literals (VERDICT r10 #7):

    * a leading bare-identifier Session argument is dropped —
      ``assertQuery(session, sql[, expected])`` asserts the same
      Presto-vs-oracle differential, the Session only carries
      optimizer/feature toggles that must not change results (and a
      result-changing toggle would surface as a pinned fail here).
      Round 12 (ADVICE r11): the drop is unconditional only for 3-arg
      calls; a 2-arg identifier-first call is dropped only when the
      identifier NAMES a session (``*session*``), because the 2-arg
      form is ambiguous — ``assertQuery(query, "VALUES ...")`` has the
      SQL in the identifier, and dropping it would leave a vacuous
      literal-vs-itself case;
    * ``format("...", <constants>)`` arguments partially evaluate
      when the format string and every argument are constants
      (%s/%d only) — _format_eval.
    """
    cases: list[SemanticCase] = []
    non_literal = 0
    for fname in files:
        path = os.path.join(tests_dir, fname)
        if not os.path.exists(path):
            continue
        src = open(path, encoding="utf-8").read()
        for m in _CALL_RE.finditer(src):
            parsed = _scan_call(src, m.end() - 1)
            if parsed is None:
                continue
            argtext, _ = parsed
            args = _split_top_level_args(argtext)
            session_arg = bool(
                _resolved_value(args[0]) is None
                and ((len(args) == 3 and _IDENT_ARG_RE.match(args[0]))
                     or (len(args) == 2
                         and _SESSION_IDENT_RE.match(args[0]))))
            if session_arg:
                args = args[1:]
            vals = [_resolved_value(a) for a in args]
            if len(vals) not in (1, 2) or any(v is None for v in vals):
                non_literal += 1
                continue
            line = src.count("\n", 0, m.start()) + 1
            tag = "+session" if session_arg else ""
            query = vals[0]
            if len(vals) == 2 and _EXECUTE_SQL_RE.match(query):
                recovered = _recover_execute(src, m.start(), query)
                if recovered is None:
                    non_literal += 1
                    continue
                query = recovered
                tag += "+execute"
            cases.append(SemanticCase(
                source=f"{fname}:{line}{tag}",
                query=query,
                oracle=vals[1] if len(vals) == 2 else vals[0],
                ordered=bool(m.group(1)),
            ))
    return cases, non_literal
