"""Replay of the reference's golden-output SQL corpus (SURVEY §5.5).

The reference's product tests ship 372 `.sql` testcases with tempto
golden `.result` files
(presto-product-tests/src/main/resources/sql-tests/testcases/) plus
the fixture datasets they ran on (sql-tests/datasets/).  This module
replays them through Engine.sql:

* golden tier — typed compare against the reference's own goldens
  (fixture tables reproduced exactly; the goldens came from the
  reference engine, so a match is direct output parity);
* execute tier — the reference's own query texts (incl. all 103
  TPC-DS product-test queries over the spec schema) must analyze and
  execute through the Presto dialect layer;
* skip tier — every skip carries a recorded reason (connector
  catalogs, DDL corpus forms, values not reproducible without dbgen).

Skipped wholesale when the reference tree is not present (the
reference-independent goldens live in queries/corpus_suite.py).
"""

from __future__ import annotations

import os

import pytest

from presto_spark.corpus.replay import CORPUS_ROOT, discover, run_case

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(CORPUS_ROOT),
        reason="reference corpus not present",
    ),
    # Corpus replay is the heavy tier (VERDICT r15 next-round #1):
    # hundreds of reference cases through Spark+DuckDB.
    pytest.mark.slow,
]

CASES = discover() if os.path.isdir(CORPUS_ROOT) else []
GOLDEN = [rc for rc in CASES if rc.policy == "golden"]
EXECUTE = [rc for rc in CASES if rc.policy == "execute"]
SKIPPED = [rc for rc in CASES if rc.policy == "skip"]


@pytest.fixture(scope="module")
def corpus_engine(spark):
    from presto_spark.corpus.replay import setup_catalog
    from presto_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    setup_catalog(eng)
    yield eng
    # the corpus catalog overrides shared temp views (spec-padded
    # TPC-H, fixture nation/region) — re-register the engine tables so
    # later test modules see the plain sf-dir catalog again
    for name, df in eng.tables.items():
        df.createOrReplaceTempView(name)


def test_every_case_is_accounted_for():
    """Policy totals: nothing silently dropped, and the tier sizes
    can only grow (a reference update may add cases; shrinkage means
    the classifier started dropping work)."""
    assert len(CASES) == len(GOLDEN) + len(EXECUTE) + len(SKIPPED)
    assert len(GOLDEN) >= 120, [rc.rel for rc in GOLDEN]
    assert len(EXECUTE) >= 175
    assert all(rc.reason for rc in SKIPPED), "skip without a reason"
    assert all(rc.reason for rc in EXECUTE), "execute without a reason"


@pytest.mark.parametrize("rc", GOLDEN, ids=[rc.rel for rc in GOLDEN])
def test_corpus_golden(corpus_engine, rc):
    outcome = run_case(corpus_engine, rc)
    assert outcome.ok, outcome.problems


def test_corpus_execute_sweep(corpus_engine):
    failures = []
    for rc in EXECUTE:
        outcome = run_case(corpus_engine, rc)
        if not outcome.ok:
            failures.append((rc.rel, outcome.problems[:1]))
    assert not failures, failures


def test_fixtures_match_reference_datasets():
    """Anti-drift: the vendored fixture rows must stay byte-equivalent
    to the reference's dataset files, and the spec nation/region must
    match the reference's own tpch-connector golden."""
    from presto_spark.corpus import fixtures
    from presto_spark.corpus.format import load_data, load_result

    ds = os.path.join(CORPUS_ROOT, "..", "datasets")

    def canon(v):
        return "" if v is None else str(v)

    dt = load_data(os.path.join(ds, "datatype.data"))
    assert len(dt) == len(fixtures.DATATYPE_ROWS)
    for ref, ours in zip(dt, fixtures.DATATYPE_ROWS):
        assert len(ref) == len(ours)
        for r, o in zip(ref, ours):
            if r is None:
                assert o is None
            elif isinstance(o, float):
                assert float(r) == o
            elif isinstance(o, bool):
                assert r.lower() == str(o).lower()
            elif isinstance(o, int):
                assert int(r) == o
            else:
                # decimals/dates/strings vendored as their source text
                # (modulo decimal-insignificant leading zeros)
                assert canon(o).lstrip("+") == r or (
                    "." in r and float(r) == float(o))

    wk = load_data(os.path.join(ds, "workers.data"))
    assert len(wk) == len(fixtures.WORKERS_ROWS)
    for ref, ours in zip(wk, fixtures.WORKERS_ROWS):
        for r, o in zip(ref, ours):
            assert (r is None) == (o is None)
            if r is not None:
                assert str(o) == r

    golden = load_result(os.path.join(
        CORPUS_ROOT, "tpch_connector", "selectFromNationTiny.result"))
    ref_nations = sorted(
        (int(r[0]), r[1], int(r[2])) for r in golden.rows)
    assert ref_nations == sorted(fixtures.NATIONS)
