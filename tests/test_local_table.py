"""local_table.local_df — the Arrow local-rows path must be
value- and schema-identical to createDataFrame(list, schema).

The helper exists purely as an optimization (r16): the classic list
path materializes through a pickled Python RDD that costs a
Python-worker round trip per plan evaluation; the Arrow path
evaluates JVM-side.  Every consumer (dedup_clusters' local CC labels,
llm_bpe_train's merge table, kmeans_cents, geo golden rows) relies on
the two paths being interchangeable.
"""

import pytest

from presto_spark.local_table import local_df


CASES = [
    # ints with NULL must stay ints (pandas would coerce to float64
    # without the object-dtype guard)
    ([(1, 2), (3, None)], "a bigint, b bigint"),
    ([(0, "ab", "c'd\nnl")], "i int, a string, b string"),
    ([(-1, 0.0, 0.25)], "g long, x double, y double"),
    ([(0, [1.0, 2.5]), (1, [0.1])], "cent_id int, cv array<double>"),
    ([("x", "y")], "doc_id string, cluster_id string"),
    ([(True, False)], "p boolean, q boolean"),
    # empty rows take the classic fallback (a columnless pandas frame
    # cannot bind a schema)
    ([], "a int, b string"),
]


@pytest.mark.parametrize("rows,schema", CASES, ids=[str(i) for i in range(len(CASES))])
def test_local_df_matches_classic_path(spark, rows, schema):
    classic = spark.createDataFrame(rows, schema)
    arrow = local_df(spark, rows, schema)
    assert arrow.schema == classic.schema
    assert arrow.collect() == classic.collect()


def test_local_df_avoids_python_rdd_scan(spark):
    plan = local_df(spark, [(1, "a")], "i int, s string")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "ExistingRDD" not in plan or "arrow" in plan.lower()
