"""Mergeable quantile sketch values (Presto qdigest/tdigest parity).

Reference: Presto stores quantile sketches as first-class column values
(QDIGEST/TDIGEST types) with a two-level lifecycle — build per
fine-grained group, merge upward without rescanning raw rows:
``qdigest_agg`` (QuantileDigestAggregationFunction.java),
``merge`` (MergeQuantileDigestFunction area),
``value_at_quantile`` (QuantileDigestFunctions.java).  Spark's
``percentile_approx`` is internally mergeable but cannot expose the
sketch as a value, so a day-level sketch table that rolls up to month/
year — the pattern that makes 100 TB percentile dashboards incremental
— is not expressible with builtins.  This module supplies it.

Design — deterministic KLL-style weighted coreset:

* a sketch is two parallel arrays (values ``vs``, weights ``ws``),
  value-sorted, at most ``k`` entries;
* build: sort the group's values, then repeatedly collapse adjacent
  pairs (the heavier value survives, weights add) until ≤ k entries.
  Total weight is preserved exactly; each collapse perturbs any rank
  by at most min(w1, w2), so rank error is bounded by the collapsed
  weight — the KLL compaction bound with a deterministic (not coin-
  flip) survivor rule, trading a constant factor for reproducibility
  (same reason the LSH/minhash operators use deterministic hashes:
  results become oracle-checkable without losing the scalable plan);
* merge: concatenate entry lists, re-sort, re-compact — associative
  and commutative, so Spark may combine partials in any order;
* query: value at the first entry whose cumulative weight reaches
  q × total.

Scale shape (the part that must survive 1000 executors): level-1
sketches are built per (group × shard) with ``applyInPandas`` — the
shard key caps any single pandas batch at |group|/n_shards rows, so a
hot group cannot OOM an executor — then shard sketches merge upward in
a second, tiny aggregation whose input is n_groups × n_shards rows of
≤ k entries each.  Raw data crosses the wire once; everything after is
sketch-sized.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_K = 512


def _compact(vs: np.ndarray, ws: np.ndarray, k: int):
    """Collapse value-sorted (vs, ws) to ≤ k entries, preserving total
    weight; deterministic heavier-survivor rule."""
    while len(vs) > k:
        n = len(vs) - (len(vs) % 2)
        keep_left = ws[0:n:2] >= ws[1:n:2]
        v2 = np.where(keep_left, vs[0:n:2], vs[1:n:2])
        w2 = ws[0:n:2] + ws[1:n:2]
        if len(vs) % 2:
            v2 = np.append(v2, vs[-1])
            w2 = np.append(w2, ws[-1])
        vs, ws = v2, w2
    return vs, ws


def _build(values: np.ndarray, k: int):
    # NULL inputs arrive as NaN in the float batch; qdigest_agg ignores
    # NULLs (QuantileDigestFunctions input function), and a NaN entry
    # would sort last and corrupt the upper quantiles.
    vals = values.astype(np.float64)
    vs = np.sort(vals[~np.isnan(vals)])
    ws = np.ones(len(vs), dtype=np.float64)
    return _compact(vs, ws, k)


def _merge(vs_lists, ws_lists, k: int):
    vs = np.concatenate([np.asarray(x, dtype=np.float64) for x in vs_lists])
    ws = np.concatenate([np.asarray(x, dtype=np.float64) for x in ws_lists])
    order = np.argsort(vs, kind="stable")
    return _compact(vs[order], ws[order], k)


def _value_at(vs: np.ndarray, ws: np.ndarray, q: float) -> float:
    """value_at_quantile (QuantileDigestFunctions.java valueAtQuantile)."""
    if len(vs) == 0:
        return float("nan")
    cum = np.cumsum(ws)
    target = q * cum[-1]
    idx = int(np.searchsorted(cum, target, side="left"))
    return float(vs[min(idx, len(vs) - 1)])


def value_at_quantile(vs, ws, q: float) -> float:
    """Python-side quantile query over a collected sketch row."""
    return _value_at(np.asarray(vs, dtype=np.float64),
                     np.asarray(ws, dtype=np.float64), q)


def quantile_sketch_agg(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    k: int = DEFAULT_K,
    n_shards: int = 32,
) -> DataFrame:
    """qdigest_agg(x) → one sketch row per group.

    Two-level build, MAP-SIDE first level (r15 optimization round,
    guide §2.3 "aggregate before you shuffle"): each Arrow batch
    groups locally and collapses its values to a ≤ k coreset per
    group, so raw rows never cross an exchange — only sketch rows
    (n_batches × n_groups × ≤ k entries) feed the in-group merge.
    The r14 shape shuffled every raw row to (group, shard) pandas
    groups; the shard key existed to cap pandas-group memory, a bound
    the Arrow batch size now provides directly (``n_shards`` is kept
    for API compatibility and ignored).  Merge is associative and
    commutative, so batch-local partials compose to the same
    rank-error envelope.  Output schema:
    group_cols + (vs array<double>, ws array<double>).
    """
    gtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    gsig = ", ".join(f"{c} {gtypes[c]}" for c in group_cols)
    batch_schema = f"{gsig}, vs array<double>, ws array<double>"

    def build_batches(batches):
        for pdf in batches:
            rows = []
            if len(pdf):
                for keys, grp in pdf.groupby(
                        group_cols, sort=False, dropna=False):
                    if not isinstance(keys, tuple):
                        keys = (keys,)
                    vs, ws = _build(grp[value_col].to_numpy(), k)
                    rows.append((*keys, vs.tolist(), ws.tolist()))
            yield pd.DataFrame(rows, columns=[*group_cols, "vs", "ws"])

    batch_sketches = df.select(*group_cols, value_col).mapInPandas(
        build_batches, batch_schema)
    return merge_quantile_sketches(batch_sketches, group_cols, k=k)


def merge_quantile_sketches(
    df: DataFrame, group_cols: list, k: int = DEFAULT_K
) -> DataFrame:
    """merge(qdigest) → one merged sketch row per group (rollup step).

    Input rows carry (vs, ws) sketch columns; output is the same shape
    one level up.  Input size is sketch-count × k, never raw-data-sized.
    """
    gtypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    gsig = ", ".join(f"{c} {gtypes[c]}" for c in group_cols)
    schema = f"{gsig}, vs array<double>, ws array<double>"

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        vs, ws = _merge(pdf["vs"].tolist(), pdf["ws"].tolist(), k)
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out["vs"] = [vs.tolist()]
        out["ws"] = [ws.tolist()]
        return pd.DataFrame(out)

    return (
        df.select(*group_cols, "vs", "ws")
        .groupBy(*group_cols)
        .applyInPandas(merge_group, schema)
    )


def sketch_quantiles_col(qs: list):
    """Column expr: array of value_at_quantile(sketch, q) for each q —
    JVM-side replay of _value_at over the (vs, ws) arrays so reading a
    sketch table needs no Python."""
    def one(q):
        # cumulative weight via aggregate over a running sum is O(n²) in
        # expression form; with k ≤ 1024 entries per sketch this stays
        # trivial (sketch-sized, not data-sized).
        total = F.aggregate("ws", F.lit(0.0), lambda a, x: a + x)
        # index of first entry with cum >= q * total
        idx = F.aggregate(
            F.sequence(F.lit(1), F.size("ws")),
            F.struct(F.lit(0.0).alias("cum"), F.lit(0).alias("found")),
            lambda acc, i: F.struct(
                (acc["cum"] + F.element_at("ws", i)).alias("cum"),
                F.when(
                    (acc["found"] == 0)
                    & (acc["cum"] + F.element_at("ws", i) >= total * F.lit(q)),
                    i,
                ).otherwise(acc["found"]).alias("found"),
            ),
            lambda acc: F.greatest(acc["found"], F.lit(1)),
        )
        return F.element_at("vs", idx)

    return F.array(*[one(q) for q in qs])
