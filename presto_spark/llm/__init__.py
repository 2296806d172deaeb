"""LLM-training-data pipeline operators (the north-star extension).

Not reference parity — Presto has none of these (SURVEY.md §7 M6) — but
built with the same engine discipline: every operator is a DataFrame
transform of JVM-side column expressions (no Python row UDFs in hot
paths), shuffle-aware, and designed to run at 100 TB:

* dedup: exact (hash groupBy), MinHash+LSH (banded bucket join),
  SimHash, n-gram Jaccard — presto_spark/llm/dedup.py
* similarity: brute-force cosine top-k + sign-LSH bucketed ANN —
  presto_spark/llm/similarity.py
* text analysis: stats/quality, language-ID, tokenization,
  fingerprinting — presto_spark/llm/text.py
* multimodal: binary payload plumbing with Arrow-batched feature
  extraction — presto_spark/llm/multimodal.py
"""

from presto_spark.llm import dedup, mix, multimodal, similarity, text  # noqa: F401
