"""Deduplication operators for large text corpora.

Four tiers, each a DataFrame transform built from JVM-side expressions:

1. exact_dedup        — digest groupBy; the only shuffle moves (digest,
                        id), never the text.
2. minhash signatures — k permutation-hash minima over word shingles;
                        pure map work.
3. LSH candidate pairs— band the signature, shuffle once on
                        (band, band_hash), self-join inside buckets.
4. verification       — exact n-gram Jaccard on candidates only.

100 TB design notes:
* The LSH shuffle key (band, band_hash) is uniformly distributed by
  construction (hash values), so no skew salting is needed; bucket
  self-joins are bounded by bucket size, and pathological buckets (all
  docs identical) are handled by the exact-dedup pass running first.
* Signatures are ARRAY<BIGINT>(k) ≈ 8k bytes/doc — the only payload
  shuffled; at k=64 that is ~512 B/doc (50 GB per 100 B docs), well
  within shuffle capacity.
* The survivor policy (keep min doc_id of each duplicate cluster) is a
  single groupBy on the pair list — no iterative connected components
  needed for the common near-dup case; a full CC (graphframes-style
  label propagation) can be layered on for chained clusters.

The permutation hashes use deterministic mod-arithmetic
(h_j(x) = (a_j*x + b_j) mod p) so the DuckDB oracle can reproduce every
signature bit-exactly — same spirit as the reference's deterministic
TPC-H test data (presto-tpch/.../TpchRecordSet.java).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presto_spark.llm.text import MOD, poly_hash, tokens

# Deterministic permutation-hash parameters (a_j, b_j) for j < 16.
# Generated as small odd multipliers/offsets; any fixed coprime set works.
NUM_HASHES = 16
HASH_PARAMS: list[tuple[int, int]] = [
    (1_000_003 * (j + 1) + 17, 7_919 * (j + 1) + 3) for j in range(NUM_HASHES)
]
LSH_BANDS = 4
LSH_ROWS = NUM_HASHES // LSH_BANDS  # 4 rows per band


def token_hashes(col: Column) -> Column:
    """Per-token char-level poly hashes — each token hashed exactly once."""
    return F.transform(tokens(col), lambda t: _poly_hash_str(t))


def shingles_from_token_hashes(th: Column, n: int = 3) -> Column:
    """Distinct n-gram shingle hashes from a token-hash array.

    A shingle hash folds the n member token hashes with the same 31-base
    recurrence — O(n) per shingle on 8-byte ints, vs re-hashing every
    character of the joined shingle string (the naive form re-reads each
    character n times; measured 6.3s → 2s for shingling sf0.1).
    """
    combine = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, h: (acc * 31 + h) % MOD
    )
    return F.array_distinct(
        F.when(F.size(th) < n, F.array(combine(th))).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(th) - n + 1),
                lambda i: combine(F.slice(th, i, n)),
            )
        )
    )


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, each reduced to a poly-hash int.

    Shingle→int immediately (SQL-side) so downstream operators never
    carry string arrays — at corpus scale the signature pipeline touches
    8-byte ints only.  Single-expression form; prefer with_shingles for
    pipelines (materializes token hashes so they compute once).
    """
    return shingles_from_token_hashes(token_hashes(col), n)


def _poly_hash_str(col: Column) -> Column:
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % MOD,
    )


def _py_shingles(text, n: int = 3):
    """Python replica of token_hashes → shingles_from_token_hashes,
    value-exact against the Column path (pinned by
    test_with_shingles_python_matches_column_path):

    * tokens: trim spaces, lowercase, split on Java ``\\s+`` — the
      ASCII class [ \\t\\n\\x0b\\f\\r], NOT Python's Unicode \\s;
    * char fold: (acc*31 + codepoint) mod 1e9+7 per token (Spark
      ``ascii`` is the first codepoint; ``split(tok, '')`` is
      codepoint-level);
    * shingles: 31-base fold of each token-hash 3-window (whole array
      when shorter), first-occurrence-deduplicated (array_distinct
      order);
    * NULL text keeps the Column path's [NULL] artifact (legacy
      size(NULL) = -1 takes the short-array arm) — consumers guard it
      exactly as before.
    """
    import re

    if text is None:
        return [None]
    hs = []
    for tok in re.split("[ \t\n\x0b\f\r]+", text.strip(" ").lower()):
        h = 0
        for c in tok:
            h = (h * 31 + ord(c)) % MOD
        hs.append(h)
    if len(hs) < n:
        acc = 0
        for h in hs:
            acc = (acc * 31 + h) % MOD
        return [acc]
    out = dict()
    for i in range(len(hs) - n + 1):
        acc = 0
        for h in hs[i:i + n]:
            acc = (acc * 31 + h) % MOD
        out[acc] = None
    return list(out)


def with_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    null_text_as_null: bool = False,
) -> DataFrame:
    """(id, shingles ARRAY<BIGINT>) — the materialization point.

    r15 optimization round (guide §4.2): the char-level rolling hash is
    a per-character ``aggregate`` lambda, and Catalyst never compiles
    higher-order-function lambdas — the interpreted fold cost ~1 s of
    the ~2 s LSH row at sf0.1.  The tokenize→hash→shingle chain now
    runs in one Arrow-batched pass (`_py_shingles`, value-exact per
    the parity pin above; ~3× faster and one fewer projection).  Every
    consumer below reuses this column; callers that fan out into
    multiple consumers should persist it (near_dedup_pairs does) — the
    engine's CTE-materialization policy (SURVEY §4:
    LogicalCteOptimizer.java has no Catalyst analog, so we persist
    explicitly at the operator level).

    ``null_text_as_null=True`` keeps NULL text at NULL shingles instead
    of the Column chain's legacy [NULL] artifact — the NULL-guarded
    shape contamination_report needs (ADVICE r13); for non-NULL text
    both modes are the identical parity-pinned pass.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def run(batches):
        import pandas as pd

        if null_text_as_null:
            mk = lambda t: None if t is None else _py_shingles(t)  # noqa: E731
        else:
            mk = _py_shingles
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "shingles": [mk(t) for t in pdf[text_col]],
            })

    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} {id_type}, shingles array<bigint>")


def minhash_from_shingles(
    sh: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, minhash ARRAY<BIGINT>(k)) via explode → 16 min() aggregates.

    This shape — one row per (doc, shingle_hash), then map-side-combined
    min() per hash function — computes each shingle hash exactly once.
    The naive nested-expression form (array of 16 array_min(transform))
    re-evaluates the shingle pipeline per hash function because Catalyst
    collapses projections without CSE across output columns: 16x the
    work (measured: 138s → 8s at sf0.1).  Partial aggregation means the
    shuffle carries at most k longs per doc per partition.

    r15 optimization note: a shuffle-free Arrow alternative (row-local
    signatures via np.minimum.reduceat, bit-identical int64 math) was
    measured head-to-head — warm it ties (~1.8 vs ~2.0 s for the full
    LSH row at sf0.1), but it pays a multi-second Python-worker cold
    start on first use and puts the Python boundary on the corpus-wide
    path (guide §4.1), where this form's exchange is already
    map-side-combined to ≤ k longs per doc.  The JVM form is kept.
    """
    exploded = sh.select(F.col(id_col), F.explode("shingles").alias("h"))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MOD)).alias(f"mh{j}")
        for j, (a, b) in enumerate(HASH_PARAMS)
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*aggs)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"mh{j}") for j in range(NUM_HASHES)]).alias("minhash"),
        )
    )


def with_minhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id + original cols joined back, minhash) — convenience wrapper."""
    sig = minhash_from_shingles(with_shingles(df, id_col, text_col), id_col)
    return df.join(sig, on=id_col)


def lsh_candidate_pairs_from_signatures(
    sig: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b), deduplicated.

    Plan shape: explode k/r bands → shuffle on (band, band_hash) →
    per-bucket self-join → distinct pairs.  The band hash folds the r
    signature values with the same poly recurrence
    (_banded_signatures — the one banding implementation, shared with
    near_dedup_against; folded here in r15 as planned).
    """
    banded = _banded_signatures(sig, id_col)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col(f"l.band") == F.col(f"r.band"),
                F.col(f"l.bucket") == F.col(f"r.bucket"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard(col_a: Column, col_b: Column) -> Column:
    """Exact Jaccard over two shingle-hash arrays (already distinct)."""
    inter = F.size(F.array_intersect(col_a, col_b))
    union = F.size(col_a) + F.size(col_b) - inter
    return F.round(inter.cast("double") / union, 6)


def near_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Verified near-duplicate pairs: LSH candidates filtered by exact
    Jaccard ≥ threshold.  Returns (id_a, id_b, jaccard).

    The shingle table feeds three consumers (signature aggregation and
    both sides of the verification join) — persisted so shingling runs
    once (explicit CTE materialization; Catalyst would otherwise inline
    and recompute it per consumer).  The verified pairs are eagerly
    materialized (localCheckpoint) so the shingle cache can be RELEASED
    before returning — a long-lived session must not accumulate
    persisted shingle tables across invocations (they are corpus-sized;
    the pairs are not).
    """
    from pyspark.storagelevel import StorageLevel

    from presto_spark.operators.cte import checkpoint_tracked

    sh = with_shingles(df, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = lsh_candidate_pairs_from_signatures(
        minhash_from_shingles(sh, id_col), id_col
    )
    a = sh.alias("sa")
    b = sh.alias("sb")
    pairs, ids = checkpoint_tracked(
        cands.join(a, cands.id_a == F.col(f"sa.{id_col}"))
        .join(b, cands.id_b == F.col(f"sb.{id_col}"))
        .select(
            "id_a", "id_b",
            jaccard(F.col("sa.shingles"), F.col("sb.shingles")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    sh.unpersist()
    # Callers that fully consume the pairs (e.g. cluster assignment,
    # which re-checkpoints its own labels) can release these blocks
    # eagerly instead of waiting for GC + ContextCleaner:
    pairs.checkpoint_rdd_ids = ids
    return pairs


def _banded_signatures(sig: DataFrame, id_col: str) -> DataFrame:
    """(id, band, bucket) rows: one explode, map-side.  The single
    banding implementation — both lsh_candidate_pairs_from_signatures
    (same-corpus self-join) and near_dedup_against (cross-corpus
    equi-join) build their candidate keys here."""
    return sig.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LSH_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.aggregate(
                        F.slice(F.col("minhash"), b * LSH_ROWS + 1, LSH_ROWS),
                        F.lit(0).cast("long"),
                        lambda acc, x: (acc * 31 + x % 1_000_003) % MOD,
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def near_dedup_against(
    new_docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str = "doc_id",
    ref_text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Cross-corpus NEAR-dedup (VERDICT r13 next-round #2 — the
    FineWeb/RefinedWeb-style weekly pass: flag documents in a new
    crawl batch that near-duplicate anything already in the ingested
    reference corpus, at word-3-gram MinHash-LSH granularity).

    Returns (new_id, ref_id, jaccard) — one row per verified
    cross-corpus near-duplicate pair with exact shingle Jaccard >=
    ``threshold``.  Downstream drops ``new_id IN (SELECT new_id ...)``
    from the batch, exactly like near_dedup_pairs' survivor policy.

    Plan shape (all ingredients shared with the in-corpus pipeline):
    both corpora shingle ONCE (with_shingles; persisted — each feeds
    its signature aggregation and the verification join), MinHash
    signatures band identically on both sides, and candidates come
    from an EQUI-join of the two banded tables on (band, bucket) — a
    plain hash shuffle, never a corpus broadcast, never all-pairs.
    Exact Jaccard over the shingle arrays verifies survivors.

    Scale: the reference side's banded signatures are precomputable
    and reusable across batches (they are a pure function of the
    reference text — persist them as a table in production); per
    batch the reference corpus then costs one scan of 4 smallint-
    keyed rows per doc, and the join output is bounded by bucket
    collisions exactly as in the self-join case (uniform hash keys,
    no skew salting needed).  Only (id, band, bucket) and the
    candidate (new_id, ref_id) pairs shuffle; text never leaves the
    scans.
    """
    from pyspark.storagelevel import StorageLevel

    from presto_spark.operators.cte import checkpoint_tracked

    sh_new = with_shingles(new_docs, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK)
    sh_ref = with_shingles(reference, ref_id_col, ref_text_col).persist(
        StorageLevel.MEMORY_AND_DISK)
    pairs, ids = checkpoint_tracked(
        _cross_near_dedup_plan(sh_new, sh_ref, id_col, ref_id_col,
                               threshold))
    sh_new.unpersist()
    sh_ref.unpersist()
    pairs.checkpoint_rdd_ids = ids
    return pairs


def _cross_near_dedup_plan(
    sh_new: DataFrame,
    sh_ref: DataFrame,
    id_col: str,
    ref_id_col: str,
    threshold: float,
) -> DataFrame:
    """The un-checkpointed cross-corpus pipeline over two shingle
    tables — split out so the plan pin (tests/test_plans.py) can
    inspect the REAL candidate-join plan: the eager localCheckpoint in
    near_dedup_against truncates executedPlan to a post-checkpoint
    scan, which would make a plan assertion on the public API
    vacuous."""
    banded_new = _banded_signatures(
        minhash_from_shingles(sh_new, id_col), id_col
    ).select(F.col(id_col).alias("new_id"), "band", "bucket")
    banded_ref = _banded_signatures(
        minhash_from_shingles(sh_ref, ref_id_col), ref_id_col
    ).select(F.col(ref_id_col).alias("ref_id"), "band", "bucket")
    cands = (
        banded_new.join(banded_ref, ["band", "bucket"])
        .select("new_id", "ref_id")
        .distinct()
    )
    a = sh_new.select(F.col(id_col).alias("__nid"),
                      F.col("shingles").alias("__nsh"))
    b = sh_ref.select(F.col(ref_id_col).alias("__rid"),
                      F.col("shingles").alias("__rsh"))
    return (
        cands.join(a, cands.new_id == F.col("__nid"))
        .join(b, cands.ref_id == F.col("__rid"))
        .select(
            "new_id", "ref_id",
            jaccard(F.col("__nsh"), F.col("__rsh")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# Edge lists at or below this row count run connected components on
# the driver (a LIMIT n+1 probe bounds the collect either way); larger
# graphs use the distributed label-propagation loop.  Verified near-dup
# pair lists are far smaller than the corpus, but at web scale they can
# still be billions of rows — the distributed path stays the fallback.
LOCAL_EDGE_ROWS = 2_000_000


def _cc_local(
    edges: list[tuple[int, int]]
) -> dict[int, int]:
    """Union-find connected components over an edge list →
    {node: min reachable id}.  Same fixpoint as the distributed
    min-label propagation (both compute min id per component), pinned
    equal by test_dedup_clusters_local_matches_distributed."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {n: comp_min[find(n)] for n in parent}


def dedup_clusters(
    pairs: DataFrame, max_iters: int = 20,
    local_edge_rows: int = LOCAL_EDGE_ROWS,
) -> DataFrame:
    """Connected components over near-duplicate pairs → (doc_id, cluster_id).

    cluster_id = min doc_id reachable through the pair graph.  Iterative
    min-label propagation: each round joins current labels across edges
    and keeps the smaller label, until a fixpoint (checked via count of
    changed labels).  Near-dup graphs are shallow (duplicate groups, not
    long chains), so rounds ≈ graph diameter ≈ 2-4; each round is one
    shuffle on doc_id.  This is the standard Spark CC-by-label-prop —
    GraphFrames does the same plan.

    ``pairs``: (id_a, id_b) undirected edges.

    Block lifecycle (VERDICT r2 "What's wrong" #2): each round's
    localCheckpoint pins RDD blocks that DataFrame.unpersist cannot
    release; we track the ids (operators/cte.py checkpoint_tracked) and
    free round N's blocks as soon as round N+1 is materialized.  Only
    the final labels checkpoint survives the call, and the ContextCleaner
    reclaims it once the caller drops the result.
    """
    from presto_spark.operators.cte import checkpoint_tracked, release_checkpoints

    spark = pairs.sparkSession
    # Adaptive local fast path (r15 optimization round, the BPE/AQE
    # small-side pattern): a bounded LIMIT n+1 probe; if the whole
    # edge list is driver-sized, union-find replaces 2-5 rounds of
    # join+checkpoint+count jobs whose cost at small scale is pure
    # scheduler overhead.  Identical output — both forms label every
    # node with the min id reachable through the pair graph.
    if local_edge_rows > 0:
        head = pairs.select("id_a", "id_b").limit(
            local_edge_rows + 1).collect()
        if len(head) <= local_edge_rows:
            labels = _cc_local([(r.id_a, r.id_b) for r in head])
            id_type = pairs.schema["id_a"].dataType.simpleString()
            from presto_spark.local_table import local_df
            return local_df(
                spark, sorted(labels.items()),
                f"doc_id {id_type}, cluster_id {id_type}")
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    # localCheckpoint each round: truncates the lineage so round N's
    # plan doesn't replan rounds 1..N-1 (the classic iterative-DataFrame
    # trap); also materializes, so the changed-count scan reuses it.
    labels, label_ids = checkpoint_tracked(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    for _ in range(max_iters):
        # smallest neighbor label per node
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nb_min"))
        )
        # Fold the convergence flag into the same pass: `chg` marks rows
        # whose label shrank, so the changed-count is a scan over the
        # fresh checkpoint instead of an extra labels⋈updated join.
        updated, new_ids = checkpoint_tracked(
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nb_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
                (
                    F.coalesce(F.col("nb_min"), F.col("cluster_id"))
                    < F.col("cluster_id")
                ).alias("chg"),
            )
        )
        changed = updated.where(F.col("chg")).count()
        release_checkpoints(spark, label_ids)
        labels, label_ids = updated.drop("chg"), new_ids
        if changed == 0:
            break
    edges.unpersist()
    return labels


def simhash16(col: Column) -> Column:
    """16-bit SimHash over word tokens (deterministic, oracle-checkable).

    bit_b = sign(Σ_tokens (2*((hash(tok) >> b) & 1) - 1)); implemented
    with div/mod so DuckDB reproduces it without engine bitops.
    """
    tok_hashes = F.transform(tokens(col), lambda t: _poly_hash_str(t))
    bits = [
        F.when(
            F.aggregate(
                tok_hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + (F.floor(h / F.lit(2 ** b)) % 2 * 2 - 1).cast("long"),
            ) > 0,
            F.lit(2 ** b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(16)
    ]
    out = bits[0]
    for x in bits[1:]:
        out = out + x
    return out


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: keep the minimum id per content digest.

    Only (digest, id) pairs shuffle; the digest here is md5 for
    cross-engine oracles — switch to xxhash64(text, length(text)) in
    production for speed (both JVM-side).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dedup_against(
    new_docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str = "text",
) -> DataFrame:
    """Cross-corpus exact dedup (incremental ingestion): keep one copy
    per digest WITHIN the new batch (minimum id wins, like
    exact_dedup) and drop any digest that already exists in the
    reference corpus — the standard "dedup today's crawl against
    everything already ingested" pass.

    Returns (digest, keep_id, n_copies) for surviving digests only.

    Scale: both sides reduce to (digest[, id]) before any join — text
    never shuffles; the reference side is distinct digests (anti-join
    build side), so a 100 TB reference costs one digest scan + one
    hash shuffle, and the anti-join is AQE-broadcastable when the
    reference digest set is small.
    """
    batch = exact_dedup(new_docs, id_col=id_col, text_col=text_col)
    ref_digests = reference.select(
        F.md5(F.col(ref_text_col)).alias("digest")).distinct()
    return batch.join(ref_digests, "digest", "left_anti")


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    max_shingle_bench_df: int | None = None,
) -> DataFrame:
    """Benchmark decontamination report: for each training document,
    how much of it appears verbatim (word 3-gram granularity) in a
    benchmark/eval corpus — the pass every training pipeline runs
    before a model ships, so eval questions are not in the training
    set.

    Returns (id, n_shingles, n_contaminated, contamination_ratio,
    n_benchmarks_hit): the document's distinct shingle count, how many
    of those shingles occur anywhere in the benchmark corpus, their
    ratio (rounded to 6 places), and how many distinct benchmark
    documents share at least one shingle.

    Scale: both corpora reduce to (id, shingle-hash BIGINT) rows —
    text never shuffles, and each corpus is SHINGLED ONCE: a single
    INNER equi-join on the 8-byte hash (benchmark sides are typically
    tiny next to the corpus → AQE broadcasts them) feeds one aggregate
    whose two distinct-counts read the matched shingle hash and the
    matched benchmark id; the per-document shingle total comes
    straight off the shingle array (no second scan) and a left join
    back onto it keeps every document — including NULL-text rows,
    whose shingles (and so n_shingles/contamination_ratio) are NULL
    and whose match counts coalesce to 0, matching what the SQL
    oracle's len()/coalesce() produce (ADVICE r13: the explode-only
    shape silently dropped them).

    Hot-shingle amplification (VERDICT r13): the join emits
    Σ_h d(h)·b(h) rows, so a stop-word shingle present in thousands
    of benchmark docs multiplies every matching corpus row.  Bounded
    for real bench sets; for large eval suites pass
    ``max_shingle_bench_df`` to drop shingles occurring in more than
    that many distinct benchmark documents BEFORE the corpus join —
    such shingles are boilerplate, not leaked eval content, and the
    cap turns the worst-case join volume from Σ d(h)·b(h) into
    Σ d(h)·min(b(h), cap).  Capped shingles count as uncontaminated.
    """
    # NULL-text guard (ADVICE r13): NULL text must keep NULL shingles
    # (the SQL oracle's NULL-chain semantics), not the shared path's
    # legacy [NULL] artifact.  r15: this side now rides the same Arrow
    # shingle pass as the bench side via with_shingles'
    # null_text_as_null mode — the Column token-hash chain here was the
    # last interpreted char-fold in the row (guide §4.2).
    dsh = with_shingles(
        docs, id_col=id_col, text_col=text_col, null_text_as_null=True)
    # r15 optimization round (guide §2.4): the r14 shape aggregated the
    # inner shingle join and LEFT-joined the result back onto the
    # per-document shingle counts — a corpus⋈corpus SortMergeJoin (two
    # sort exchanges) just to re-attach n_shingles and keep match-less
    # documents.  Instead n_shingles rides the exploded rows (one long
    # per row), explode_outer keeps NULL-text documents (NULL h), the
    # bench join turns LEFT, and ONE aggregation produces every output
    # column: count_distinct ignores NULLs, so unmatched and NULL-text
    # documents fall out with 0 matches exactly as the join-back form
    # produced.  Plan diff: SortMergeJoin LeftOuter + 2 Exchanges gone.
    d = dsh.select(
        F.col(id_col),
        F.when(F.col("shingles").isNotNull(),
               F.size("shingles").cast("long")).alias("n_shingles"),
        F.explode_outer("shingles").alias("h"))
    b = with_shingles(
        bench, id_col=bench_id_col, text_col=bench_text_col,
    ).select(
        F.col(bench_id_col).alias("__bench_id"),
        F.explode("shingles").alias("h"))
    if max_shingle_bench_df is not None:
        hot = (
            b.groupBy("h")
            .agg(F.count_distinct("__bench_id").alias("__df"))
            .where(F.col("__df") > max_shingle_bench_df)
            .select("h"))
        b = b.join(hot, "h", "left_anti")
    return (
        d.join(b, "h", "left")
        .groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.count_distinct(
                F.when(F.col("__bench_id").isNotNull(), F.col("h"))
            ).alias("n_contaminated"),
            F.count_distinct(F.col("__bench_id")).alias("__n_bench"),
        )
        .select(
            F.col(id_col),
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_shingles"), 6
            ).alias("contamination_ratio"),
            F.col("__n_bench").alias("n_benchmarks_hit"),
        ))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    method: str = "lsh",
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for
    unordered pairs with cosine similarity >= threshold.

    method='lsh' (DEFAULT — the 100 TB path): multi-table sign-LSH
    bucketing (similarity.lsh_bucket, the OR-construction: L disjoint
    plane families) generates candidates via an EQUI-join on
    (table, bucket) — a plain hash shuffle, no broadcast of the corpus,
    no nested-loop — then the exact cosine predicate verifies survivors
    and duplicates (a pair co-bucketed in several tables) collapse
    post-filter, so only above-threshold pairs ever shuffle twice.
    Approximate: recall is 1-(1-p^n_planes)^n_tables per pair (p =
    1 - angle/pi), pinned by the registry recall-envelope query.

    method='exact': the all-pairs broadcast self-join verification tier
    — quadratic compare volume and a corpus-sized broadcast; correct for
    verification sets only, never the default at scale.
    """
    from presto_spark.llm import similarity

    v = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_e"),
    )
    if method == "exact":
        a = v.select(F.col("_id").alias("id_a"), F.col("_e").alias("_ea"))
        b = v.select(F.col("_id").alias("id_b"), F.col("_e").alias("_eb"))
        return (
            a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                F.round(
                    similarity.cosine(F.col("_ea"), F.col("_eb")), 6
                ).alias("cosine"),
            )
            .where(F.col("cosine") >= threshold)
        )
    if method != "lsh":
        raise ValueError(f"method must be lsh/exact: {method}")
    # One scan computes all L bucket ids; posexplode fans each vector
    # out to its L (table, bucket) cells map-side.
    buckets = F.array(*[
        similarity.lsh_bucket(F.col("_e"), n_planes, dim,
                              plane_offset=t * n_planes)
        for t in range(n_tables)
    ])
    e = v.select("_id", "_e", F.posexplode(buckets).alias("_t", "_b"))
    a = e.select("_t", "_b", F.col("_id").alias("id_a"),
                 F.col("_e").alias("_ea"))
    b = e.select("_t", "_b", F.col("_id").alias("id_b"),
                 F.col("_e").alias("_eb"))
    scored = (
        a.join(b, ["_t", "_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(
                similarity.cosine(F.col("_ea"), F.col("_eb")), 6
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    # Cosine is recomputed per co-bucketed table (map-side CPU), so the
    # dedup shuffle carries only the above-threshold survivor pairs.
    return scored.dropDuplicates(["id_a", "id_b"])


def paragraph_dedup(
    df: DataFrame,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style corpus-level boilerplate removal (round 15): split
    each document into newline paragraphs, digest each, and REMOVE
    paragraphs whose exact digest occurs ``min_count``-plus times
    across the corpus (cookie banners, nav bars, license footers);
    survivors reassemble in order.  Returns
    (id, n_paragraphs, n_removed, clean_text).

    Shapes: paragraph fan-out is a map-side posexplode; the only
    corpus-wide shuffle carries (16-byte digest, count) pairs — text
    rides one group-by-document reassembly keyed on id.  Empty/
    whitespace-only lines never count as boilerplate and are dropped
    from the reassembly (paragraph-structure normalization, like the
    C4 line filters).  Hot digests are bounded by construction: the
    count table is digest-distinct, and removal is a filter, not a
    join fan-out.

    The synthetic ``documents`` table has no cross-document repeated
    paragraphs at the driver SFs, so this operator carries
    pytest-grade evidence (hand-built corpora + an inline-VALUES
    DuckDB differential) instead of a vacuous zero-removal registry
    row — the threshold lesson from the r15 verify notes.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "para"),
    ).where(F.trim(F.col("para")) != "")
    counts = paras.groupBy(
        F.md5(F.col("para")).alias("pdigest")
    ).agg(F.count("*").alias("pcount"))
    flagged = paras.withColumn(
        "pdigest", F.md5(F.col("para"))
    ).join(counts, "pdigest")
    kept = flagged.withColumn(
        "removed", (F.col("pcount") >= min_count).cast("int"))
    return (
        kept.groupBy(id_col)
        .agg(
            F.count("*").alias("n_paragraphs"),
            F.sum("removed").alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("removed") == 0,
                                F.struct(F.col("idx"), F.col("para")),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )
