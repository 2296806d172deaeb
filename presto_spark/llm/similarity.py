"""Embedding similarity search.

Two tiers:

* brute-force cosine top-k — exact baseline.  The query set is broadcast
  (it is small by construction); each executor scans its corpus
  partition once, computes dot products JVM-side (zip_with + aggregate),
  and a per-query window keeps top-k.  At 100 TB the scan dominates and
  parallelizes perfectly; the window shuffle moves only
  (query_id, corpus_id, score) rows.
* sign-LSH bucketed ANN — scale path.  A deterministic pseudo-random
  hyperplane bank maps each vector to a bucket signature; candidates
  share a bucket, so the expensive dot products run on a small fraction
  of pairs.  Recall is validated in-query against the brute-force
  baseline (self-validating envelope, same pattern the approx-aggregate
  queries use).

All arithmetic is double-cast before accumulation so results are
deterministic and reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from presto_spark.llm.text import MOD


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double(a: Column) -> Column:
    """float[] → double[] before any accumulation (exact widening)."""
    return F.transform(a, lambda x: x.cast("double"))


def l2_normalize(a: Column) -> Column:
    """Unit-length vector: v / ||v||; zero vectors pass through.

    Standard pre-step before cosine/IP search (normalized vectors make
    dot product == cosine, halving the per-pair arithmetic).  Pure
    JVM expression, map-side.
    """
    n = norm(a)
    return F.when(n == 0, a).otherwise(F.transform(a, lambda x: x / n))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, sim) with sim rounded to 6dp and a
    deterministic (sim DESC, neighbor_id) tie-break.

    r15 optimization round (guide §4.2): norms are per-ROW functions, so
    they compute once before the join instead of per PAIR inside
    cosine() — same float expression on the same value (bit-exact; the
    norm folds are interpreted HOF lambdas, and the pair count
    multiplies them |corpus|×|queries| times otherwise).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("nq", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("nc", norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv"))
             / (F.col("nq") * F.col("nc"))).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim_raw", 6).alias("sim"))
    )


# --- IVF (inverted-file) ANN ------------------------------------------------

def assign_cells(
    df: DataFrame, cents: DataFrame, id_alias: str, vec_alias: str
) -> DataFrame:
    """Assign each vector to its best centroid cell (argmax cosine,
    centroid-id tie-break).  One broadcast cross join against the tiny
    centroid bank — n_centroids × dim multiply-adds per row, no shuffle
    of the vectors themselves."""
    scored = df.crossJoin(F.broadcast(cents)).select(
        id_alias,
        vec_alias,
        "cent_id",
        cosine(F.col(vec_alias), F.col("cv")).alias("aff"),
    )
    w = Window.partitionBy(id_alias).orderBy(F.col("aff").desc(), F.col("cent_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_alias, vec_alias, F.col("cent_id").alias("cell"))
    )


def kmeans_cents(spark, centroids: list[list[float]]) -> DataFrame:
    """Adapter: a trained centroid bank (clustering.kmeans_train's
    list-of-lists) → the (cent_id, cv) DataFrame the IVF probe
    consumes.  cent_id is the bank index, so argmax ties break by
    training order — deterministic like everything else here."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    from presto_spark.local_table import local_df
    return local_df(
        spark,
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cent_id int, cv array<double>",
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN with nprobe=1: exact cosine inside the query's best cell.

    The coarse quantizer is deterministic either way, so results are
    bit-reproducible and the DuckDB oracle checks exact values, not
    just recall.  Default bank: the first ``n_centroids`` corpus
    vectors by id.  Pass ``centroids`` (clustering.kmeans_train's
    list-of-lists, via the kmeans_cents adapter) to probe against a
    TRAINED bank instead — trained centroids tile the embedding space
    where the data actually lives, which materially improves recall at
    the same nprobe (the first-k bank can put every seed in one dense
    region and leave far cells empty).  The cell-assignment and probe
    plan — the part that touches all 100 TB — is identical in both
    modes.  Candidates shrink ~n_centroids-fold; raise nprobe by
    exploding the top-p cells per query for higher recall.
    """
    if centroids is not None:
        cents = kmeans_cents(corpus.sparkSession, centroids)
    else:
        cents = corpus.where(F.col(id_col) < n_centroids).select(
            F.col(id_col).alias("cent_id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv_full")
    )
    c_asg = assign_cells(c, cents, "neighbor_id", "cv_full")
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    q_asg = assign_cells(q, cents, "query_id", "qv")
    scored = (
        c_asg.join(F.broadcast(q_asg), on="cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv_full")).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim_raw", 6).alias("sim"))
    )


# --- sign-LSH ---------------------------------------------------------------

def _plane_component(plane: int, dim: int) -> int:
    """Deterministic pseudo-random ±1 from (plane, dim) — Knuth-style
    multiplicative mix, reproducible in plain SQL."""
    return ((plane * 2_654_435_761 + dim * 40_503 + 12_345) % MOD)


def lsh_bucket(vec: Column, n_planes: int, dim: int,
               plane_offset: int = 0) -> Column:
    """Bucket id = sign pattern of `n_planes` fixed hyperplanes.

    Each plane's components are ±1 derived from the deterministic mix —
    equivalent to random-hyperplane LSH with a frozen seed.  Expression
    is fully JVM-side: n_planes × dim multiply-adds per row.

    ``plane_offset`` selects a disjoint plane family, so L independent
    hash tables (the OR-construction boosting recall) are
    ``lsh_bucket(v, n, dim, plane_offset=t * n) for t in range(L)``.
    """
    bucket = F.lit(0).cast("long")
    for p in range(plane_offset, plane_offset + n_planes):
        signs = [1 if _plane_component(p, d) % 2 == 0 else -1 for d in range(dim)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(s)) for s in signs]),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(
            proj > 0, F.lit(2 ** (p - plane_offset))
        ).otherwise(F.lit(0)).cast("long")
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, then exact cosine.

    With 2^n_planes buckets the candidate set shrinks ~2^n_planes-fold;
    multi-probe (hamming-1 neighbor buckets) can be added by exploding
    the bucket id — omitted here, recall is checked by the envelope
    query.

    r15: norms precompute per row before the candidate join (the same
    bit-exact once-per-row-not-per-pair move as cosine_topk)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", lsh_bucket(F.col("cv"), n_planes, dim)) \
     .withColumn("nc", norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("bucket", lsh_bucket(F.col("qv"), n_planes, dim)) \
     .withColumn("nq", norm(F.col("qv")))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            (dot(F.col("qv"), F.col("cv"))
             / (F.col("nq") * F.col("nc"))).alias("sim_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.round("sim_raw", 6).alias("sim"))
    )
