"""Embedding k-means for corpus curation (round 14, built ahead for
the r15 driver window).

Why a relational Lloyd's algorithm: semantic bucketing of a corpus —
domain balancing, semantic dedup beyond sign-LSH, IVF coarse-quantizer
TRAINING (llm/similarity.py ann_topk_ivf currently uses the first-k
deterministic bank; these trained centroids drop straight into its
``cents`` contract) — all want k centers learned from the data at
corpus scale.

Distributed design:
* Assignment is a broadcast of the tiny centroid bank (k × dim
  doubles) against every vector — argmin squared-L2 computed as one
  fold over the bank per row, map-side, no shuffle, no UDF.
* The update step is the posexplode shape: (cluster, pos, component)
  rows feed a partial-aggregatable sum/count per (cluster, pos) —
  the only shuffle per round, carrying n·dim scalars with map-side
  combine.  The k × dim result is the ONLY thing that reaches the
  driver each round.

Determinism (the engine's cross-engine discipline, queries/base.py):
double summation is order-dependent, so a plain avg() would make
centroids — and downstream assignments near ties — vary with
partitioning.  Component sums therefore run in DECIMAL(30,10)
(exact, order-free; embeddings are float32 ≪ 10 fractional digits),
and each new centroid component rounds at 9 decimals before going
back to DOUBLE.  Same input ⇒ bit-identical centroids on any
partition layout and any engine, which is what lets a SQL oracle
replay whole training runs.

Empty clusters keep their previous centroid (the standard Lloyd
fallback; deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SUM_DEC = "decimal(30,10)"
_ROUND = 9


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a constant centroid — zip with the
    literal bank + one left-to-right fold.  The lambda form keeps the
    expression tree shallow (dim literal leaves, O(1) operator nodes),
    where an unrolled (v[j]-c_j)^2 chain cost seconds of Catalyst
    analysis per training round at k x dim terms."""
    bank = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec, bank, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def _best_struct(vec: Column, centroids: list[list[float]]) -> Column:
    """STRUCT(dist, cid) of the nearest centroid: array_min over
    (dist, cid) structs — lowest cid wins exact ties.

    Shape: ONE indexed transform over a nested bank literal, so the
    expression holds a single copy of the distance fold (O(1)
    operator nodes + k·dim literal leaves) instead of k unrolled
    copies — the same node-count discipline as _sq_dist's lambda
    form, applied across the bank dimension.  Every Lloyd round
    analyzes and codegens a fresh plan with new centroid literals, so
    expression size is pure per-round overhead.  Arithmetic and
    tie-break are bit-identical to the unrolled form."""
    bank = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centroids
    ])
    return F.array_min(
        F.transform(
            bank,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(vec, c, lambda x, cc: (x - cc) * (x - cc)),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ).alias("dist"),
                i.alias("cid"),
            ),
        )
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach ``cluster_id`` = argmin squared-L2 over the centroid
    bank (lowest id wins ties — deterministic).  Map-side only."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(
        "cluster_id", _best_struct(v, centroids)["cid"].cast("int"))


def kmeans_train(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 5,
) -> list[list[float]]:
    """Lloyd's k-means with deterministic hash-spread init and a
    FIXED iteration count (engine-replayable: a convergence test on
    doubles would couple the round count to float noise).  Returns the
    k × dim centroid bank (driver-side — small by construction).

    Init picks the k vectors whose ids sort first by
    (md5(id-as-string), id) — the deterministic_split trick.  Replayable
    like first-k-by-id (both engines hash the same decimal string) but
    without its degeneracy: the first k rows of a corpus are often
    CLUSTERED (one crawl batch, one domain), while an md5 order is a
    uniform sample of the id space (VERDICT r14 What's-wrong #4)."""
    if k <= 0 or n_iters <= 0:
        raise ValueError(f"k and n_iters must be positive: {k}, {n_iters}")
    init_rows = (
        df.orderBy(F.md5(F.col(id_col).cast("string")), id_col).limit(k)
        .select(F.transform(F.col(vec_col),
                            lambda x: x.cast("double")).alias("v"))
        .collect()
    )
    centroids = [list(r.v) for r in init_rows]
    if len(centroids) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(centroids)}")
    dim = len(centroids[0])
    for _ in range(n_iters):
        assigned = assign_clusters(df, centroids, vec_col)
        comp = assigned.select(
            "cluster_id",
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("pos", "val"),
        )
        sums = (
            comp.groupBy("cluster_id", "pos")
            .agg(
                F.sum(F.col("val").cast(_SUM_DEC)).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep old
        acc: dict[int, list] = {}
        for r in sums:
            acc.setdefault(r.cluster_id, [None] * dim)[r.pos] = (r.s, r.n)
        for cid, cells in acc.items():
            new[cid] = [
                round(float(s) / int(n), _ROUND) for (s, n) in cells
            ]
        centroids = new
    return centroids


def kmeans_fit_assign(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 5,
) -> DataFrame:
    """Train + final assignment in one call:
    (id, cluster_id, dist) rows, dist rounded at 6 for cross-engine
    comparison."""
    centroids = kmeans_train(df, k, vec_col, id_col, n_iters)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best = _best_struct(v, centroids)
    return df.select(
        F.col(id_col),
        best["cid"].cast("int").alias("cluster_id"),
        F.round(best["dist"], 6).alias("dist"))


def semantic_dedup_pairs(
    df: DataFrame,
    k: int,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 5,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al.
    2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication" — public recipe): cluster the embedding
    space with k-means, then compare cosine similarity ONLY within
    each cluster and report unordered pairs at or above ``threshold``
    (the caller drops the higher id per pair, or feeds the pairs to
    dedup_clusters for transitive groups).

    Scale: this is the paper's own answer to all-pairs cosine being
    quadratic — the join is an equi-join on cluster_id, so compare
    volume is Σ_c |c|², bounded by choosing k ~ n/target_cluster_size
    (SemDeDup uses ~50k clusters at web scale).  Embeddings ride the
    cluster-keyed shuffle once; no corpus broadcast, no NL join
    (AQE keeps the equi-join hashed).  Each side L2-normalizes ONCE
    before the join, so the per-pair work is a single dot fold
    instead of dot + two norms — 3x less arithmetic on the quadratic
    stage (zero vectors pass through normalization and score 0
    instead of NULL-cosine; they never reach a positive threshold
    either way).  Cross-cluster near-duplicates at the Voronoi
    boundary are missed by construction — the paper's documented
    recall trade; raise k recall via the sign-LSH tier
    (embedding_near_dup_pairs) when boundary recall matters.
    """
    from presto_spark.llm import similarity

    assigned = kmeans_fit_assign(
        df, k, vec_col, id_col, n_iters).select(id_col, "cluster_id")
    v = df.join(assigned, id_col).select(
        F.col(id_col).alias("_id"), "cluster_id",
        similarity.l2_normalize(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("_e"))
    a = v.select("cluster_id", F.col("_id").alias("id_a"),
                 F.col("_e").alias("_ea"))
    b = v.select("cluster_id", F.col("_id").alias("id_b"),
                 F.col("_e").alias("_eb"))
    return (
        a.join(b, ["cluster_id"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "cluster_id", "id_a", "id_b",
            F.round(similarity.dot(F.col("_ea"), F.col("_eb")), 6)
            .alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
