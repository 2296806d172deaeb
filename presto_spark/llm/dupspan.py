"""Exact substring-duplication audit (round 15, built ahead for the
r16 driver window).

The recipe from "Deduplicating Training Data Makes Language Models
Better" (Lee et al. 2022 — public): find text spans that occur more
than once across (or within) the corpus and measure how much of each
document is covered by duplicated spans.  The reference implementation
builds a corpus suffix array; the relational shape that scales on
Spark is positional k-gram fingerprints:

* positional k-grams: (doc, pos, gram_hash) from one map-side
  transform of the token-hash array — text never leaves the scan;
* duplicated grams: gram_hash groups with total corpus count >= 2
  (one map-side-combinable count aggregation — the only corpus-wide
  shuffle, carrying (hash, count) pairs);
* coverage: a duplicated k-gram at pos p covers tokens p..p+k-1;
  per-document covered-token count = count(distinct covered index)
  via a k-wide sequence explode of duplicated positions only (bounded
  by k x dup-positions, never n_tokens x k).

Everything is integer arithmetic on the shared poly-hash recurrence
(llm/text.py), so a SQL oracle replays every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from presto_spark.llm.dedup import token_hashes
from presto_spark.llm.text import MOD


def positional_kgrams(
    df: DataFrame, k: int, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, gram_hash) — pos is the 1-based token index where the
    k-gram starts.  Documents shorter than k tokens contribute no
    rows.  Map-side only."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    th = df.select(F.col(id_col), token_hashes(F.col(text_col)).alias("th"))
    # Spark sequence(1, stop) DESCENDS when stop < 1 (it would emit
    # bogus positions for docs shorter than k) — gate short docs to an
    # explicit empty array instead.
    positions = F.when(
        F.size("th") < k, F.array().cast("array<int>")
    ).otherwise(F.sequence(F.lit(1), F.size("th") - (k - 1)))
    grams = th.select(
        F.col(id_col),
        F.explode(
            F.transform(
                positions,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.aggregate(
                        F.slice("th", i, k),
                        F.lit(0).cast("long"),
                        lambda acc, x: (acc * 31 + x) % MOD,
                    ).alias("gram_hash"),
                ),
            )
        ).alias("g"),
    )
    return grams.select(id_col, "g.pos", "g.gram_hash")


def duplication_report(
    df: DataFrame, k: int = 5, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span audit:
    (id, n_tokens, n_dup_grams, dup_tokens, dup_token_fraction).

    ``n_dup_grams`` counts this document's k-gram positions whose
    fingerprint occurs >= 2 times in the whole corpus (within- or
    cross-document — Lee et al. count both); ``dup_tokens`` is the
    number of distinct token positions covered by at least one such
    gram, and the fraction divides by the document's token count
    (rounded at 6).  Documents shorter than k tokens report zero
    duplication.
    """
    grams = positional_kgrams(df, k, id_col, text_col)
    counts = grams.groupBy("gram_hash").agg(
        F.count("*").alias("gram_count"))
    dup = (
        grams.join(counts, "gram_hash")
        .where(F.col("gram_count") >= 2)
        .select(id_col, "pos")
    )
    cover = (
        dup.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("tok_idx"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("tok_idx").alias("dup_tokens"))
    )
    ndup = dup.groupBy(id_col).agg(F.count("*").alias("n_dup_grams"))
    base = df.select(
        F.col(id_col),
        F.size(token_hashes(F.col(text_col))).alias("n_tokens"))
    return (
        base.join(ndup, id_col, "left")
        .join(cover, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest("n_tokens", F.lit(1)), 6
            ).alias("dup_token_fraction"),
        )
    )
