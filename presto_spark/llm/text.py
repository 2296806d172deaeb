"""Text-analysis operators over document tables.

All pure Column expressions — they inline into whole-stage codegen and
scale linearly with no shuffle (per-row map work).  The deterministic
polynomial hash (mod 1e9+7, 31-base) is used instead of xxhash64
wherever a cross-engine oracle needs to reproduce the value in ANSI SQL;
production pipelines can swap in xxhash64 (faster, also JVM-side) via
``hash_fn='xxhash64'``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007
BASE = 31

# Tiny per-language stopword markers for the heuristic language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "und", "die", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # romanized markers
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def poly_hash(col: Column) -> Column:
    """Deterministic rolling hash: fold (acc*31 + ascii(char)) mod 1e9+7.

    Reproducible in any SQL engine (DuckDB oracle uses list_reduce with
    the same recurrence) — the cross-engine analog of Presto's xxhash64
    fingerprinting (reference: operator/scalar/VarbinaryFunctions.java
    xxhash64).  Cost: one pass over characters, JVM-side.
    """
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * BASE + x) % MOD,
    )


def tokens(col: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization: letter runs, digit runs, and punctuation
    as separate tokens — the first pass of a byte-pair tokenizer; counts
    approximate LLM token counts.  Same regex works in the DuckDB oracle
    (regexp_extract_all in both dialects)."""
    return F.regexp_extract_all(F.lower(col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0))


def _with_text_stats_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Original Column-expression form of with_text_stats — kept as the
    parity reference for the Arrow pass (pinned by
    test_with_text_stats_python_matches_column_path)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    return (
        df.withColumn("n_chars_calc", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            F.round(
                F.aggregate(toks, F.lit(0).cast("long"),
                            lambda acc, x: acc + F.length(x)).cast("double")
                / n_tok, 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("double")
                / n_tok, 6),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                (F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))).cast("double")
                / F.length(t), 6),
        )
        .withColumn(
            "space_ratio",
            F.round(
                (F.length(t) - F.length(F.regexp_replace(t, " ", ""))).cast("double")
                / F.length(t), 6),
        )
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-document statistics used for quality filtering.

    r15 optimization round (guide §4.2): the tokenize→aggregate→filter
    chain is three interpreted higher-order-function lambdas over the
    token array per row (Catalyst never compiles HOF lambdas) — and
    Catalyst's projection collapse re-derives the token array for each
    stats column.  The integer token stats (count, summed length,
    stopword hits) now come from ONE Arrow-batched pass
    (text_token_stats_udf, value-exact per its parity pin); the ratio
    arithmetic and rounding stay JVM expressions on those exact
    integers, and the char-level regex ratios stay native (codegen'd).
    NULL text: the struct fields are NULL and n_tokens coalesces to the
    legacy size(NULL) = -1 the Column chain produced, so every derived
    value (including stopword_ratio's -1/-1 = 1.0 artifact) is
    unchanged.

    100 TB note: pure map-side work; pair with a partition count sized to
    input splits.  No data skew concern (per-row).
    """
    from presto_spark.llm._pandas_udfs import text_token_stats_udf

    t = F.col(text_col)
    d = df.withColumn("__st", text_token_stats_udf(t))
    n_tok = F.coalesce(F.col("__st.nt"), F.lit(-1))
    return (
        d.withColumn("n_chars_calc", F.length(t))
        .withColumn("n_tokens", n_tok)
        .withColumn(
            "avg_token_len",
            F.round(F.col("__st.cs").cast("double") / n_tok, 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                F.coalesce(F.col("__st.sh"), F.lit(-1)).cast("double")
                / n_tok, 6),
        )
        .withColumn(
            "digit_ratio",
            F.round(
                (F.length(t) - F.length(F.regexp_replace(t, "[0-9]", ""))).cast("double")
                / F.length(t), 6),
        )
        .withColumn(
            "space_ratio",
            F.round(
                (F.length(t) - F.length(F.regexp_replace(t, " ", ""))).cast("double")
                / F.length(t), 6),
        )
        .drop("__st")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length, token shape, stopwords.

    Mirrors common LLM-corpus heuristics (Gopher/C4-style rules) as one
    deterministic expression.
    """
    d = with_text_stats(df, text_col)
    score = (
        F.when(F.col("n_tokens") < 5, 0.0)
        .otherwise(
            F.round(
                F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
                + F.least(F.col("avg_token_len") / 8.0, F.lit(1.0)) * 0.3
                + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.3,
                6,
            )
        )
    )
    return d.withColumn("quality", score)


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-token hits.

    Deterministic tie-break: higher count wins; on equal counts the
    lexicographically greatest code wins (struct sort is field-by-field,
    and the DuckDB oracle replicates the same rule).  Map-side only.
    """
    toks = tokens(F.col(text_col))
    scored = F.array(*[
        F.struct(
            F.size(F.filter(toks, lambda x: x.isin(*marks))).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, marks in sorted(LANG_MARKERS.items())
    ])
    best = F.sort_array(scored, asc=False)[0]
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und")),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprint (deterministic, oracle-checkable)."""
    return df.withColumn("fingerprint", poly_hash(F.col(text_col)))


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks.

    The canonical training-data op: (doc) → (doc, chunk_no, chunk_text,
    n_tokens).  Stride = chunk_tokens - overlap; the final partial
    window is kept.  Pure JVM expression (tokens → sequence of slices →
    posexplode): map-side only, no shuffle — at 100 TB chunking is free
    parallelism, bounded by the scan.
    """
    stride = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - overlap, F.lit(1)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s, chunk_tokens), " ")
    )
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_no", "chunk_text")
    )
    return out.withColumn(
        "n_tokens", F.size(tokens(F.col("chunk_text")))
    ).withColumn("chunk_no", F.col("chunk_no") + 1)


def vocabulary(
    df: DataFrame, text_col: str = "text", min_count: int = 2
) -> DataFrame:
    """Corpus vocabulary: (token, n_docs, n_occurrences), count-filtered.

    explode + two-level count with map-side partial aggregation — the
    shuffle carries (token, partial counts), never documents.  The
    foundation for BPE training / frequency-based filtering.
    """
    toked = df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("token"))
    per_tok = toked.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return per_tok.where(F.col("n_occurrences") >= min_count)


def normalize_nfc(df: DataFrame, text_col: str = "text",
                  out_col: str = "text_nfc") -> DataFrame:
    """Unicode NFC normalization (reference: operator/scalar/
    StringFunctions.java normalize()).

    Spark has no normalize builtin, so this is the one text op that
    crosses into Python — as an Arrow-batched pandas iterator
    (mapInPandas shape via pandas_udf), never per-row py4j.  DuckDB's
    nfc_normalize provides the cross-engine oracle.
    """
    from presto_spark.llm._pandas_udfs import nfc_normalize_udf

    return df.withColumn(out_col, nfc_normalize_udf(F.col(text_col)))


# ---- repetition filters (training-data quality; the duplicate-text
# heuristics popularized by the Gopher/MassiveText data-prep recipe:
# Rae et al. 2021, "Scaling Language Models", appendix A1.1) ----------------

def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals: duplicate-line fraction,
    duplicate-word fraction, and top-bigram coverage.

    * ``dup_line_frac`` — 1 − distinct(lines)/lines (newline-split,
      trimmed, empties dropped).
    * ``dup_word_frac`` — 1 − distinct(words)/words.
    * ``top_bigram_frac`` — occurrences of the most frequent word
      bigram over total bigrams.

    The line/word fractions are pure Column expressions.  The bigram
    mode is the one signal that needs grouping, and doing it per-row
    would be O(words²); instead bigrams explode to (doc, bigram) rows
    and aggregate — map-side combinable, shuffle keyed on the doc id:
    the shape that survives a 100 TB corpus (same discipline as
    vocabulary()).  Filter downstream with the caller's thresholds
    (the recipe uses dup_line ≤ 0.30, top_bigram ≤ 0.18).
    """
    words = tokens(F.col(text_col))
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), F.trim),
        lambda s: s != "",
    )
    frac = lambda arr: F.when(  # noqa: E731
        F.size(arr) > 0,
        1.0 - F.size(F.array_distinct(arr)).cast("double")
        / F.size(arr).cast("double"),
    ).otherwise(F.lit(0.0))
    base = df.select(
        id_col,
        frac(lines).alias("dup_line_frac"),
        frac(words).alias("dup_word_frac"),
        F.greatest(F.size(words) - 1, F.lit(0)).alias("__nbi"),
    )
    bigrams = df.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
                F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("__bg"),
    )
    top = (
        bigrams.groupBy(id_col, "__bg").agg(F.count("*").alias("__c"))
        .groupBy(id_col).agg(F.max("__c").alias("__top"))
    )
    return (
        base.join(top, id_col, "left")
        .select(
            id_col, "dup_line_frac", "dup_word_frac",
            F.when(
                F.col("__nbi") > 0,
                F.coalesce(F.col("__top"), F.lit(0)).cast("double")
                / F.col("__nbi").cast("double"),
            ).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


# ---- PII redaction (training-data hygiene) --------------------------------

_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    # order matters: emails before bare domains, SSN before phone so the
    # dashed 9-digit shape is not half-eaten by the phone rule.
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"(?:\b(?:\+?\d{1,2}[ .-])?\d{3}|\(\d{3}\))[ .-]?\d{3}[ .-]?\d{4}\b",
     "[PHONE]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
)


def redact_pii(col: Column) -> Column:
    """Chained regexp_replace over the standard PII shapes (emails,
    SSNs, NANP phone numbers, IPv4 literals) — pure codegen expression
    work, zero shuffle; patterns are the widely-published corpus-
    scrubbing defaults, each replaced with a typed placeholder token so
    downstream tokenization stays stable."""
    out = col
    for pat, tag in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


# HTML → text extraction (the first stage of every web-crawl corpus
# pipeline).  Ordered regexp chain; each step is a codegen
# regexp_replace, zero shuffle, and the same regexes run verbatim in a
# SQL oracle.  Scope: tag/comment/script/style stripping + the common
# named entities — a full HTML5 parser (trafilatura/bs4 class) is a
# library concern; this is the relational-engine tier of it.
_HTML_STEPS: tuple[tuple[str, str], ...] = (
    # script/style/comment blocks drop with their CONTENT
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    # block-level closers become line breaks so paragraphs survive
    (r"(?i)<(?:br|/p|/div|/h[1-6]|/li|/tr)\b[^>]*>", "\n"),
    # every remaining tag drops
    (r"(?s)<[^>]+>", " "),
    # common named + numeric entities — &amp; decodes LAST so escaped
    # entity text single-decodes ('&amp;lt;' → '&lt;', not '<'; the
    # classic entity-order bug, ADVICE r13)
    (r"&nbsp;", " "), (r"&lt;", "<"), (r"&gt;", ">"),
    (r"&quot;", "\""), (r"&#39;", "'"), (r"&amp;", "&"),
    # whitespace hygiene: collapse runs, trim line edges, drop
    # leading/trailing line breaks (trim() only strips spaces)
    (r"[ \t]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^\n+|\n+$", ""),
)


def html_to_text(col: Column) -> Column:
    """Extract visible text from an HTML payload — script/style/comment
    blocks removed with their content, block-level tags become line
    breaks, remaining tags stripped, the common entities decoded, and
    whitespace collapsed.  Pure chained regexp_replace (codegen, zero
    shuffle); the identical regex chain replays in DuckDB."""
    out = col
    for pat, rep in _HTML_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def pii_stats(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-document PII hit counts by category + the redacted text —
    the audit-then-scrub pair a corpus pipeline runs before training."""
    cols = [F.col(id_col)]
    for pat, tag in _PII_PATTERNS:
        name = tag.strip("[]").lower() + "_hits"
        cols.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
                   ).cast("long").alias(name))
    cols.append(redact_pii(F.col(text_col)).alias("redacted"))
    return df.select(*cols)


# ---- C4 line-level hygiene (the public C4 cleaning recipe: Raffel et
# al. 2020, "Exploring the Limits of Transfer Learning" §2.2 — keep
# lines that end in terminal punctuation and have enough words, drop
# pages with lorem ipsum / code braces / too few kept lines) -------------

def c4_line_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """Per-document C4 hygiene signals and the final keep verdict.

    Columns: ``n_lines`` (non-empty, trimmed), ``n_kept_lines`` (ends
    in ``. ! ? "``, has ≥ min_words_per_line whitespace words, and
    does not mention "javascript" — C4 removes javascript LINES, not
    pages; ADVICE r7), ``kept_line_frac``, ``has_lorem_ipsum``
    (case-insensitive page check), ``has_brace`` (``{`` anywhere —
    the code-page heuristic), ``has_javascript_line`` (signal only),
    and ``keep_document`` = kept lines ≥ min_kept_lines AND neither
    of the two PAGE-level flags (lorem ipsum, brace) — matching
    Raffel et al. §2.2, where the javascript filter only drops the
    offending line.

    Pure Column expressions priced in line count per row — zero
    shuffle, the same scan-hot shape as quality_score.
    """
    raw_lines = F.split(F.col(text_col), "\n")
    lines = F.filter(
        F.transform(raw_lines, F.trim), lambda ln: ln != "")

    def is_kept(ln):
        terminal = ln.rlike('[.!?"]$')
        enough = F.size(F.split(ln, r"\s+")) >= min_words_per_line
        no_js = ~F.lower(ln).contains("javascript")
        return terminal & enough & no_js

    kept = F.filter(lines, is_kept)
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    lower = F.lower(F.col(text_col))
    has_lorem = lower.contains("lorem ipsum")
    has_brace = F.col(text_col).contains("{")
    has_js = F.exists(lines, lambda ln: F.lower(ln).contains("javascript"))
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        F.when(n_lines > 0, n_kept.cast("double") / n_lines.cast("double"))
        .otherwise(F.lit(0.0)).alias("kept_line_frac"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        has_js.alias("has_javascript_line"),
        (
            (n_kept >= min_kept_lines) & ~has_lorem & ~has_brace
        ).alias("keep_document"),
    )
