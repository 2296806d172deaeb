"""Differential correctness for relational-operator and function suites."""

import pytest

from presto_spark.queries import REGISTRY
from tests.conftest import SF_DIR, assert_same

NAMES = [
    n for n, q in REGISTRY.items()
    if {"relational", "functions"} & set(q.tags)
]


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = REGISTRY[name]
    sdf = q.spark(spark, SF_DIR)
    if q.oracle is None:
        assert sdf.count() >= 0
    else:
        assert_same(sdf, duck, q.oracle)
