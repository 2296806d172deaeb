"""Empty-input robustness: every operator class must handle 0 rows.

Empty partitions and fully-filtered inputs are routine at 100 TB
(partition pruning can zero out whole scans); operators must return
empty/identity results, not throw.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_spark.llm import dedup, similarity, text
from presto_spark.operators import aggregates as A
from presto_spark.operators import relational as R
from presto_spark.operators import sketches as S


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_aggregates_on_empty(spark):
    df = spark.createDataFrame([], "g int, v int")
    out = df.groupBy("g").agg(
        A.map_agg(F.lit("k"), F.col("v")).alias("m"),
        A.max_n(F.col("v"), 2).alias("mx"),
    )
    assert out.count() == 0
    # global agg over empty: one row, null/zero aggregates
    (row,) = df.agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    assert row.n == 0 and row.s is None


def test_window_ops_on_empty(spark):
    df = spark.createDataFrame([], "k string, o int, v int")
    assert R.grouped_top_n(df, ["k"], 2, F.col("v").desc()).count() == 0
    assert R.groups_frame(df, ["k"], "o", 1, 0, {"s": F.sum("v")}).count() == 0


def test_dedup_pipeline_on_empty(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_dedup(docs).count() == 0
    assert dedup.near_dedup_pairs(docs).count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.dedup_clusters(pairs).count() == 0


def test_similarity_on_empty(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert similarity.cosine_topk(emb, emb).count() == 0
    assert similarity.ann_topk_ivf(emb, emb).count() == 0


def test_text_ops_on_empty(spark):
    docs = _empty_docs(spark)
    assert text.chunk_documents(docs).count() == 0
    assert text.vocabulary(docs, min_count=1).count() == 0
    assert text.with_text_stats(docs).count() == 0


def test_sketches_on_empty(spark):
    df = spark.createDataFrame([], "g int, v long")
    assert S.approx_most_frequent(df, ["g"], "v", 3).count() == 0
    (row,) = df.agg(S.approx_distinct("v").alias("e")).collect()
    assert row.e == 0


def test_round6_operators_on_empty(spark):
    """Theta/KLL/T-Digest sketches, reservoir, entropy, hulls, curves,
    repetition stats on 0 rows: empty results, never throws."""
    from presto_spark.llm import text as T
    from presto_spark.operators import classification as C
    from presto_spark.operators import geo_agg
    from presto_spark.operators import kll, reservoir, tdigest, theta

    gv = spark.createDataFrame([], "g int, v double")
    assert theta.sketch_theta(gv, ["g"], "v", k=64).count() == 0
    assert theta.merge_theta_sketches(
        theta.sketch_theta(gv, ["g"], "v", k=64), ["g"]).count() == 0
    assert kll.sketch_kll_with_k(gv, ["g"], "v", k=64).count() == 0
    assert tdigest.tdigest_agg(gv, ["g"], "v").count() == 0
    assert reservoir.reservoir_sample(gv, ["g"], "v", k=5).count() == 0
    assert reservoir.differential_entropy(
        gv, ["g"], "v", sample_size=10).count() == 0
    assert reservoir.differential_entropy_histogram(
        gv, ["g"], "v", None, 4, 0.0, 1.0).count() == 0
    yb = spark.createDataFrame([], "g int, y boolean, x double")
    assert C.classification_metrics(yb, ["g"], "y", "x", 4).count() == 0
    geoms = spark.createDataFrame(
        [], "g int, geom struct<kind:string,rings:array<array<struct<x:double,y:double>>>>")
    assert geo_agg.convex_hull_agg(geoms, ["g"], "geom").count() == 0
    assert geo_agg.envelope_union_agg(geoms, ["g"], "geom").count() == 0
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert T.repetition_stats(docs, "text", "doc_id").count() == 0
    assert T.pii_stats(docs, "text", "doc_id").count() == 0


def test_round7_operators_on_empty(spark):
    """SFM sketches and the convex overlay tier on 0 rows: empty
    results / NULL geometry, never throws."""
    import math

    from presto_spark.functions import geo
    from presto_spark.operators import sfm

    gv = spark.createDataFrame([], "g int, v bigint")
    assert sfm.noisy_approx_set_sfm(
        gv, ["g"], "v", math.inf, buckets=64, precision=8).count() == 0
    assert sfm.merge_sfm_nonprivate(
        sfm.noisy_approx_set_sfm(gv, ["g"], "v", math.inf, 64, 8),
        ["g"]).count() == 0
    # empty geometry operands: overlay and simplify return NULL rows,
    # not errors
    geoms = spark.createDataFrame([], "i int, wa string, wb string") \
        .select(
            "i",
            geo.st_geometry_from_text(F.col("wa")).alias("a"),
            geo.st_geometry_from_text(F.col("wb")).alias("b")) \
        .withColumn("sa", geo.polygon_shell(F.col("a"))) \
        .withColumn("sb", geo.polygon_shell(F.col("b")))
    out = geoms.select(
        geo.st_intersection_polygons(
            F.col("a"), F.col("b"), F.col("sa"), F.col("sb")).alias("gi"),
        geo.simplify_geometry(F.col("a"), 1.0).alias("gs"),
        geo.flatten_geometry_collections(F.col("a")).alias("gf"),
    )
    assert out.count() == 0
