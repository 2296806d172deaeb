"""Differential correctness for the TPC-H-shaped suite (driver t2 shape).

Mirrors the reference's oracle-diff workhorse
(presto-tests/.../AbstractTestQueries.java run against H2QueryRunner);
ours runs against DuckDB at sf0.001.
"""

import pytest

from presto_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_same

TPCH = [n for n, q in REGISTRY.items() if "tpch" in q.tags]


@pytest.mark.parametrize("name", TPCH)
def test_tpch_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.spark(spark, SF_DIR)
    if q.oracle is None:
        assert sdf.count() >= 0
    else:
        assert_same(sdf, duck, q.oracle)
