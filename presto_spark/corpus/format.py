"""Tempto textual-format parsing + typed comparison.

Reference format (public): tempto's convention-based SQL tests —
presto-product-tests/src/main/resources/sql-tests/testcases/*.sql
carry a leading comment of `key: value; ...` directives (database,
groups, tables, requires, queryType, and optionally the result
directives when the expected rows live in the .sql file itself); the
paired `.result` files carry `delimiter / ignoreOrder / trimValues /
ignoreExcessRows / types` directives followed by delimiter-separated
rows.  Dataset `.data` files (sql-tests/datasets/) use the same row
shape with Hive's `\\N` for NULL.

Comparison mirrors tempto's QueryAssert: expected cells are parsed
into the ACTUAL column's type and compared as values, not as strings
(so `10.0` matches the double 10.0 and `0 ` under trimValues matches
the bigint 0).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from datetime import date, datetime
from decimal import Decimal

_DIRECTIVE_RE = re.compile(r"([A-Za-z]+)\s*:\s*([^;]*?)\s*(?:;|$)")


def parse_directives(line: str) -> dict[str, str]:
    """`-- delimiter: |; ignoreOrder: true; types: BIGINT|DOUBLE` →
    {'delimiter': '|', 'ignoreOrder': 'true', 'types': 'BIGINT|DOUBLE'}."""
    body = line.lstrip("-").strip()
    return {m.group(1): m.group(2) for m in _DIRECTIVE_RE.finditer(body)}


def _split_row(line: str, delimiter: str, trim: bool) -> list[str]:
    # tempto rows terminate with the delimiter; a trailing empty cell
    # is the terminator, not data.
    cells = line.split(delimiter)
    if cells and cells[-1].strip() == "":
        cells = cells[:-1]
    return [c.strip() for c in cells] if trim else cells


@dataclass
class ResultFile:
    directives: dict[str, str] = field(default_factory=dict)
    rows: list[list[str]] = field(default_factory=list)

    @property
    def ignore_order(self) -> bool:
        return self.directives.get("ignoreOrder", "false").lower() == "true"

    @property
    def ignore_excess(self) -> bool:
        return (
            self.directives.get("ignoreExcessRows", "false").lower() == "true"
        )

    @property
    def execute_only(self) -> bool:
        """A `todo:` directive means tempto only checked the query ran."""
        return "todo" in self.directives


def load_result(path: str) -> ResultFile:
    out = ResultFile()
    body_started = False
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    for line in lines:
        if not body_started and line.lstrip().startswith("--"):
            out.directives.update(parse_directives(line))
            continue
        body_started = True
        if line.strip() == "":
            continue
        delim = out.directives.get("delimiter", "|")
        trim = out.directives.get("trimValues", "false").lower() == "true"
        out.rows.append(_split_row(line, delim, trim))
    return out


@dataclass
class SqlCase:
    rel: str  # path relative to the corpus root, e.g. "join/cross_join.sql"
    header: dict[str, str]
    sql: str
    result_path: str | None
    inline: "ResultFile | None" = None  # multi-section files carry
    # their expected rows inline (tempto `--!` sections)


def load_sql_cases(path: str, rel: str,
                   result_path: str | None) -> list[SqlCase]:
    """One file → one or more cases.  Single-query files pair with an
    external `.result`; multi-section files use tempto's `--!`
    convention (`--! name: x` starts a query, a bare `--!` separates
    the query from its inline expected rows)."""
    header: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        s = lines[i].lstrip()
        if s.startswith("--") and not s.startswith("--!"):
            header.update(parse_directives(lines[i]))
            i += 1
        else:
            break
    rest = lines[i:]
    if not any(ln.lstrip().startswith("--!") for ln in rest):
        return [SqlCase(rel, header, "\n".join(rest).strip(), result_path)]

    delim = header.get("delimiter", "|")
    trim = header.get("trimValues", "false").lower() == "true"
    cases: list[SqlCase] = []
    name, sql_lines, row_lines = "", [], None
    mode = "sql"

    def flush():
        nonlocal name, sql_lines, row_lines
        text = "\n".join(sql_lines).strip()
        if text:
            inline = None
            if row_lines is not None:
                inline = ResultFile(directives=dict(header))
                inline.rows = [
                    _split_row(ln, delim, trim)
                    for ln in row_lines if ln.strip()
                ]
            nm = name or f"s{len(cases)}"
            cases.append(SqlCase(f"{rel}#{nm}", header, text, None, inline))
        name, sql_lines, row_lines = "", [], None

    for ln in rest:
        s = ln.lstrip()
        if s.startswith("--!"):
            d = parse_directives(ln)
            if "name" in d:
                flush()
                name, mode = d["name"], "sql"
            elif mode == "sql" and "\n".join(sql_lines).strip():
                mode, row_lines = "rows", []
            elif mode == "rows":
                flush()
                mode = "sql"
            # else: a separator before the first query — ignore
        elif mode == "sql":
            sql_lines.append(ln)
        else:
            row_lines.append(ln)
    flush()
    return cases


def load_data(path: str) -> list[list[str | None]]:
    """Dataset rows (sql-tests/datasets/*.data): `|`-separated, Hive
    `\\N` for NULL, no directive header in the hive-typed files."""
    rows: list[list[str | None]] = []
    with open(path, encoding="utf-8") as f:
        for line in f.read().splitlines():
            if line.lstrip().startswith("--") or line.strip() == "":
                continue
            cells = line.split("|")
            if cells and cells[-1] == "":
                cells = cells[:-1]
            rows.append([None if c == "\\N" else c for c in cells])
    return rows


# ---- typed comparison -----------------------------------------------------

class CellMismatch(Exception):
    pass


def coerce_cell(expected: str, actual):
    """Parse `expected` into the Python type of `actual` and compare.

    Returns True on match; raises CellMismatch with detail otherwise.
    Mirrors tempto's parse-expected-into-JDBC-type comparison, so the
    textual form of the golden never has to match Spark's printing.
    """
    e = expected.strip() if isinstance(expected, str) else expected
    if actual is None:
        if isinstance(e, str) and e.lower() == "null":
            return True
        raise CellMismatch(f"actual NULL, expected {e!r}")
    if isinstance(e, str) and e.lower() == "null":
        raise CellMismatch(f"expected NULL, actual {actual!r}")
    try:
        if isinstance(actual, bool):
            ok = e.lower() == str(actual).lower()
        elif isinstance(actual, int):
            ok = int(e) == actual
        elif isinstance(actual, float):
            ok = math.isclose(float(e), actual, rel_tol=1e-12, abs_tol=1e-12)
        elif isinstance(actual, Decimal):
            ok = Decimal(e) == actual
        elif isinstance(actual, datetime):
            fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in e else "%Y-%m-%d %H:%M:%S"
            ok = datetime.strptime(e, fmt) == actual
        elif isinstance(actual, date):
            ok = date.fromisoformat(e) == actual
        else:
            ok = e == str(actual)
    except (ValueError, ArithmeticError) as exc:
        raise CellMismatch(f"cannot parse {e!r} as {type(actual).__name__}: {exc}")
    if not ok:
        raise CellMismatch(f"expected {e!r}, actual {actual!r}")
    return True


def _row_matches(expected_row: list[str], actual_row) -> bool:
    if len(expected_row) != len(actual_row):
        return False
    try:
        for e, a in zip(expected_row, actual_row):
            coerce_cell(e, a)
    except CellMismatch:
        return False
    return True


def compare_rows(expected: ResultFile, actual_rows: list) -> list[str]:
    """Compare per the result file's directives.  Returns a list of
    human-readable problems (empty = match).  `actual_rows` are
    sequences of Python values (Row or tuple)."""
    problems: list[str] = []
    exp = list(expected.rows)
    act = [tuple(r) for r in actual_rows]
    if expected.ignore_order or expected.ignore_excess:
        # greedy multiset containment (tempto sorts both sides; a
        # greedy match is equivalent here because expected cells parse
        # to exact values, so a row matches at most one distinct shape)
        remaining = list(act)
        for erow in exp:
            hit = next(
                (i for i, arow in enumerate(remaining)
                 if _row_matches(erow, arow)), None)
            if hit is None:
                problems.append(f"expected row not found: {erow}")
            else:
                remaining.pop(hit)
        if not expected.ignore_excess and not problems and remaining:
            problems.append(f"{len(remaining)} unexpected extra rows, "
                            f"first: {remaining[0]!r}")
    else:
        if len(exp) != len(act):
            problems.append(f"row count: expected {len(exp)}, got {len(act)}")
        for i, (erow, arow) in enumerate(zip(exp, act)):
            if len(erow) != len(arow):
                problems.append(
                    f"row {i}: width expected {len(erow)}, got {len(arow)}")
                continue
            for j, (e, a) in enumerate(zip(erow, arow)):
                try:
                    coerce_cell(e, a)
                except CellMismatch as exc:
                    problems.append(f"row {i} col {j}: {exc}")
    return problems
