"""N-gram language-model scoring for corpus quality filtering.

The standard pipeline stage this implements (round 14, built ahead for
the r15 driver window): train a bigram LM on a reference corpus, score
every candidate document by average per-token log-probability, and
filter documents whose bits-per-token is an outlier — the KenLM-style
perplexity filter used by CCNet/FineWeb-class pipelines, here as pure
relational work so it runs at corpus scale with no model server.

Model: bigram with Laplace smoothing.  Each token is conditioned on
its predecessor (the first token on the ``<s>`` start marker):

    P(w | c) = (count(c, w) + 1) / (count(c) + V)

with V = |training vocabulary| + 1 (one shared OOV slot).  Everything
is counts + one log2 — deterministic, so a SQL oracle replays scores
to 6 decimals (log2 libm agreement across engines is ~1e-15 relative;
the engine rounds at 6 like the other double-valued rows).

Scale:
* Training is two hash-aggregations over exploded (context, token)
  rows — map-side combinable counts; text never shuffles.
* Scoring joins the document's (context, token) stream against the
  two count tables — plain equi-joins on token strings.  Zipf skew
  puts heavy keys on frequent contexts; AQE skew-join handles it, or
  pre-broadcast the counts when the model is small (a 1M-vocab bigram
  table is tens of MB — usually broadcastable even when the corpus is
  not).
* The only driver-side value is V (one scalar aggregate).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presto_spark.llm.text import tokens

START = "<s>"


def _bigram_stream(col: Column) -> Column:
    """ARRAY<STRUCT<ctx, tok>>: each token paired with its predecessor,
    the first with the ``<s>`` start marker.  Pure map-side expression
    (zip of the token array with its shifted self)."""
    toks = tokens(col)
    ctxs = F.concat(
        F.array(F.lit(START)),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    return F.zip_with(
        ctxs, toks,
        lambda c, t: F.struct(c.alias("ctx"), t.alias("tok")))


@dataclass
class BigramModel:
    """Distributed bigram counts + the vocabulary size.

    ``vocab_size`` is |training vocab| + 1 (one shared OOV slot) — an
    ``int`` when the model was trained eagerly, or a 1-row DataFrame
    ``(__V bigint)`` in lazy mode (``train_bigram_model(...,
    lazy_vocab=True)``): the scalar then rides the scoring plan as a
    broadcast instead of a separate driver collect, so the pair-count
    aggregation it derives from is shared with the scoring joins by
    AQE exchange reuse rather than recomputed in its own job (r16
    optimization round, guide §1.2 — one-plan A/B 0.98 → 0.78 s at
    sf0.1, values identical)."""

    pair_counts: DataFrame  # (ctx, tok, pair_count)
    ctx_counts: DataFrame   # (ctx, ctx_count)
    vocab_size: "int | DataFrame"  # |training vocab| + 1 (OOV slot)


def train_bigram_model(
    df: DataFrame, text_col: str = "text", lazy_vocab: bool = False
) -> BigramModel:
    """ONE count aggregation over the exploded (context, token) stream;
    everything else derives from the pair table (r15 optimization
    round, guide §1.2/§2.3 — the r14 shape tokenized and exploded the
    corpus three times):

    * ctx_count(c) = Σ_w pair_count(c, w) — a reaggregation of the
      already-tiny pair table, identical by definition (every gram
      with context c is counted once in exactly one (c, w) row).
    * |vocab| = count(DISTINCT tok) over the pair table — every
      training token appears as the ``tok`` of exactly one gram (the
      first behind ``<s>``, the rest behind their predecessor), so
      distinct tok == distinct corpus token, again by definition.

    The corpus text is scanned and tokenized once; the two derived
    aggregations shuffle only (ctx, tok) count rows.  V is the one
    scalar that reaches the driver.
    """
    grams = df.select(
        F.explode(_bigram_stream(F.col(text_col))).alias("g")
    ).select("g.ctx", "g.tok")
    pair = grams.groupBy("ctx", "tok").agg(
        F.count("*").alias("pair_count"))
    ctx = pair.groupBy("ctx").agg(
        F.sum("pair_count").alias("ctx_count"))
    if lazy_vocab:
        vdf = pair.agg((F.count_distinct("tok") + F.lit(1)).alias("__V"))
        return BigramModel(pair, ctx, vdf)
    vocab = pair.agg(F.count_distinct("tok")).collect()[0][0]
    return BigramModel(pair, ctx, int(vocab) + 1)


def score_documents(
    df: DataFrame,
    model: BigramModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document LM score: (id, n_grams, avg_log2p, ppl_bits).

    ``avg_log2p`` is the mean log2 P(token | context) under the
    model's Laplace estimate (rounded at 6 — see module docstring);
    ``ppl_bits`` = -avg_log2p is bits-per-token (log2 perplexity),
    the number a quality filter thresholds on.  Unseen contexts and
    pairs coalesce to count 0, so OOV text degrades smoothly to
    -log2(V) bits instead of diverging.
    """
    grams = df.select(
        F.col(id_col),
        F.explode(_bigram_stream(F.col(text_col))).alias("g"),
    ).select(F.col(id_col), F.col("g.ctx").alias("ctx"),
             F.col("g.tok").alias("tok"))
    j = (
        grams.join(model.pair_counts, ["ctx", "tok"], "left")
        .join(model.ctx_counts, ["ctx"], "left")
    )
    if isinstance(model.vocab_size, DataFrame):
        # Lazy mode: V joins as a broadcast 1-row relation so the pair
        # aggregation it derives from shares the scoring plan's
        # exchange instead of running as a separate collect job.
        j = j.crossJoin(F.broadcast(model.vocab_size))
        v_term = F.col("__V")
    else:
        v_term = F.lit(model.vocab_size)
    logp = F.log2(
        (F.coalesce(F.col("pair_count"), F.lit(0)) + F.lit(1))
        / (F.coalesce(F.col("ctx_count"), F.lit(0)) + v_term)
    )
    return (
        j.groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.avg(logp), 6).alias("avg_log2p"),
            F.round(-F.avg(logp), 6).alias("ppl_bits"),
        )
    )
