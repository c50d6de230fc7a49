"""topnotch_spark — a PySpark-native data-quality and data-processing engine.

A from-scratch rebuild of the capabilities of blackrock/TopNotch (a
Scala/Spark-2.0 declarative QC engine; reference surveyed in SURVEY.md),
re-expressed as idiomatic PySpark: DataFrame/SQL plans compiled by Catalyst,
AQE-enabled, shuffle-aware, with the LLM-data-pipeline extensions
(deduplication, similarity search, multimodal columns, text analysis) that a
100 TB training-data pipeline needs.

User surface (mirrors the reference's three commands + plan container,
docs/CONCEPTS.md:25-31 of the reference):

- ``assertion`` — rule-based validity checks with failure thresholds,
  invalid-row samples, window context and summary stats.
- ``diff``      — keyed two-dataset comparison with per-column equality
  status and numeric tolerance.
- ``view``      — arbitrary Spark SQL over named inputs.
- ``plan``      — nestable sequence of the above, parsed from JSON.

Extensions (this engine only): ``dedup`` (exact / minhash-LSH / simhash /
ngram-jaccard / embedding-cosine), ``similarity`` (brute-force + LSH ANN),
``text`` (lang-id, quality scoring, token stats, fingerprints),
``multimodal`` (binary payload plumbing), and a Structured-Streaming
assertion mode.
"""

__version__ = "0.1.0"

from topnotch_spark.session import get_spark  # noqa: F401
