"""spark_stream_kudu_spark — a PySpark-native analytics engine.

A brand-new engine with (at least) the query and data-processing
capabilities of the reference pipeline ``curtishoward/spark-stream-kudu``
(Kafka -> 60s sliding window -> global SQL aggregation -> keyed Kudu
upsert; see SURVEY.md), re-expressed Spark-first:

- batch relational surface: DataFrame/SQL builders over parquet tables
  (``operators.relational``) — scans, joins, aggregations, window
  functions, sorts, set ops, scalar functions; all built-in Catalyst
  expressions so predicate pushdown / column pruning / whole-stage
  codegen / AQE apply end-to-end.
- streaming surface: Structured Streaming pipeline with event-time
  windows + watermark and a ``foreachBatch`` keyed-merge sink that
  reproduces the reference's Kudu UPSERT semantics
  (``streaming.traffic``, ``streaming.sinks``).
- LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding-cosine), similarity search (brute-force +
  IVF), text analysis (lang-id, quality, tokens, fingerprint), and
  multimodal binary-column plumbing (``operators.*``).

Everything is declarative DataFrame code; Python UDFs are confined to
clearly-marked extension paths (vectorized / Arrow) and never appear in
the relational core.
"""

__version__ = "0.1.0"

from spark_stream_kudu_spark.session import get_spark, tune_session  # noqa: F401
