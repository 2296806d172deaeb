"""Corpus discovery, replay policy, and the case runner.

Policy tiers (every case lands in exactly one, with a recorded
reason — no silent drops):

* ``golden`` — run through Engine.sql and typed-compare against the
  reference's own `.result` golden.  Eligible when every referenced
  table is reproducible here: the vendored corpus fixtures
  (datatype/workers/empty) and the spec-fixed nation/region
  (including their `tpch.tiny.*` spellings), or no table at all.
* ``execute`` — run through Engine.sql and require successful
  execution (`.count()` over a bounded limit).  Used when values are
  not reproducible (airlift-generated TPC-H rows, empty TPC-DS
  schema, `todo:`-marked goldens) — this still exercises the Presto
  dialect, analysis, and the whole plan pipeline on the reference's
  own query texts.
* ``skip`` — out of engine scope, with the reason recorded
  (Hive-connector storage fixtures, DDL/DML/SHOW corpus forms,
  catalog output shapes).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from presto_spark.corpus.format import SqlCase, load_result, load_sql_cases

CORPUS_ROOT = (
    "/root/reference/presto-product-tests/src/main/resources/"
    "sql-tests/testcases"
)

# Tables whose CONTENT is reproduced exactly (fixtures + spec-fixed
# dimensions) — the golden tier.
GOLDEN_TABLES = {"datatype", "workers", "empty", "nation", "region",
                 "tiny_nation", "tiny_region"}

# Every table name the replay catalog can resolve (golden tables plus
# engine TPC-H parquet, presto-tpch `tiny_*` views, empty partsupp,
# and the empty TPC-DS schema).
from presto_spark.corpus.tpcds_schema import TPCDS_TABLES  # noqa: E402

KNOWN_TABLES = (
    GOLDEN_TABLES
    | {"customer", "orders", "lineitem", "part", "supplier", "partsupp"}
    | {f"tiny_{t}" for t in ("customer", "orders", "lineitem", "part",
                             "supplier", "partsupp")}
    | set(TPCDS_TABLES)
)

# Directory-level skips (reason per entry).  These corpus dirs test
# connector/DDL surfaces that have no analog in a library engine.
SKIP_DIRS = {
    "connectors": "connector-specific catalogs (hive/jdbc/cassandra)",
    "insert": "Hive-connector INSERT fixtures (engine DML is covered "
              "by operators/dml.py + dml_* registry rows)",
    "catalog": "catalog metadata output shapes are engine-specific "
               "(SHOW/DESCRIBE covered by show.py + tests)",
    "system": "system.runtime tables are server-specific",
    "orc": "Hive ORC storage-format fixture",
    "ml_functions": "learn_classifier/classify are DataFrame-level "
                    "operators here (operators/ml.py — a SQL aggregate "
                    "spelling needs a JVM UDAF); covered by the "
                    "ml_learn_classify_golden registry row",
}

# Case-level denylist: golden-eligible by tables, but the golden
# depends on dbgen's randomized comment text (fixture comments are
# synthetic), so value compare is impossible — executed instead.
EXECUTE_DENYLIST = {
    "window_functions/rangeCurrent.sql":
        "running frame ordered by the dbgen comment column",
}

# Cases that mention the comment column but whose output provably
# does not depend on it (UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
# frames aggregate the whole partition, so the sort key is inert).
GOLDEN_ALLOWLIST = {
    "window_functions/rowsUnbounded.sql",
    "window_functions/rangeUnbounded.sql",
}

_TINY_RE = re.compile(r'\btpch\s*\.\s*"?(?:tiny|sf\d+)"?\s*\.\s*"?(\w+)"?',
                      re.IGNORECASE)
_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def rewrite_tables(sql: str) -> str:
    """`tpch.tiny.<t>` → `tiny_<t>` (the presto-tpch connector
    spellings registered by fixtures.register_tiny_views)."""
    return _TINY_RE.sub(lambda m: f"tiny_{m.group(1).lower()}", sql)


@dataclass
class ReplayCase:
    case: SqlCase
    policy: str           # golden | execute | skip
    reason: str = ""      # for execute/skip
    sql: str = ""         # rewritten text (golden/execute)

    @property
    def rel(self) -> str:
        return self.case.rel


def _referenced_tables(sql: str) -> set[str]:
    words = {w.lower() for w in _WORD_RE.findall(sql)}
    return words & KNOWN_TABLES


def classify(case: SqlCase) -> ReplayCase:
    top = case.rel.split("/")[0]
    if "/" not in case.rel:
        return ReplayCase(case, "skip",
                          "Hive storage-format fixture (root-level case)")
    if top in SKIP_DIRS:
        return ReplayCase(case, "skip", SKIP_DIRS[top])
    sql = rewrite_tables(case.sql)
    head = sql.split(None, 1)[0].lower() if sql.split() else ""
    if head not in ("select", "with", "(select", "("):
        return ReplayCase(
            case, "skip", f"non-SELECT corpus form ({head or 'empty'})")
    tables = _referenced_tables(sql)
    unknown_qualified = re.search(
        r"\b(?:from|join)\s+\w+\.\w+", sql, re.IGNORECASE)
    if unknown_qualified:
        return ReplayCase(
            case, "skip",
            f"unmapped qualified relation ({unknown_qualified.group(0)!r})")
    if re.search(r"\btime\s+'", sql, re.IGNORECASE):
        return ReplayCase(
            case, "skip",
            "TIME literal (engine TIME is a shim family over "
            "TIMESTAMP — COVERAGE.md pinned deviation)")
    if case.rel in EXECUTE_DENYLIST:
        return ReplayCase(case, "execute", EXECUTE_DENYLIST[case.rel], sql)
    result = case.inline or (
        load_result(case.result_path) if case.result_path else None)
    if result is None or result.execute_only:
        return ReplayCase(case, "execute",
                          "no golden (.result absent or todo-marked)", sql)
    if tables <= GOLDEN_TABLES:
        # nation/region keys and names are spec-fixed, but dbgen
        # randomizes the comment columns — a golden that exposes them
        # (SELECT * or an explicit comment reference) can only be
        # executed, not value-compared.
        exposes_comment = bool(
            tables & {"nation", "region", "tiny_nation", "tiny_region"}
            and re.search(r"select\s+\*|\.\s*\*|\bcomment\b", sql,
                          re.IGNORECASE)
            and case.rel not in GOLDEN_ALLOWLIST
        )
        if exposes_comment:
            return ReplayCase(
                case, "execute",
                "exposes the dbgen-randomized comment column", sql)
        return ReplayCase(case, "golden", "", sql)
    return ReplayCase(
        case, "execute",
        f"tables not value-reproducible ({', '.join(sorted(tables - GOLDEN_TABLES))})",
        sql)


def discover(root: str = CORPUS_ROOT) -> list[ReplayCase]:
    out: list[ReplayCase] = []
    for dirpath, _, files in sorted(os.walk(root)):
        for f in sorted(files):
            if not f.endswith(".sql"):
                continue
            p = os.path.join(dirpath, f)
            rel = os.path.relpath(p, root)
            rp = p[:-4] + ".result"
            rp = rp if os.path.exists(rp) else None
            out.extend(classify(c) for c in load_sql_cases(p, rel, rp))
    return out


def setup_catalog(engine) -> None:
    """Register the full replay catalog on an Engine that already has
    the sf-dir TPC-H views: spec-padded TPC-H, corpus fixtures +
    `tiny_*` spellings, and the empty TPC-DS schema."""
    from presto_spark.corpus.fixtures import (
        register_spec_tpch, register_tiny_views)
    from presto_spark.corpus.tpcds_schema import register_empty_tpcds
    register_spec_tpch(engine.spark)
    register_tiny_views(engine.spark)
    register_empty_tpcds(engine.spark)
    # the spec-padded TPC-H customer, for restoring after a TPC-DS
    # case swapped the (colliding) `customer` view
    engine._corpus_tpch_customer = engine.spark.table("customer")


@dataclass
class Outcome:
    rel: str
    policy: str
    ok: bool
    problems: list[str] = field(default_factory=list)


def run_case(engine, rc: ReplayCase) -> Outcome:
    """Execute one golden/execute case against an Engine whose session
    already has the fixture + tiny + TPC-DS views registered."""
    spark = engine.spark
    if rc.rel.startswith("tpcds/"):
        from presto_spark.corpus.tpcds_schema import use_tpcds_customer
        use_tpcds_customer(spark)
    elif "customer" in rc.sql.lower():
        restore = getattr(engine, "_corpus_tpch_customer", None)
        if restore is None and "customer" in engine.tables:
            restore = engine.tables["customer"]
        if restore is not None:
            restore.createOrReplaceTempView("customer")
    try:
        df = engine.sql(rc.sql)
        if rc.policy == "execute":
            df.limit(1000).count()
            return Outcome(rc.rel, rc.policy, True)
        rows = df.collect()
    except Exception as e:  # noqa: BLE001 — outcome-reported, not raised
        return Outcome(rc.rel, rc.policy, False,
                       [f"{type(e).__name__}: {str(e)[:300]}"])
    from presto_spark.corpus.format import compare_rows
    expected = rc.case.inline or load_result(rc.case.result_path)
    problems = compare_rows(expected, rows)
    return Outcome(rc.rel, rc.policy, not problems, problems)
