"""sqlserver_pg_cdc_spark — a PySpark-native analytics/reconciliation engine.

A from-scratch, Spark-first reimplementation of the query and data-processing
capabilities of the reference CDC pipeline (NhaLeTruc/sqlserver-pg-cdc):

- reconciliation plane: counts, table checksums, row-level diff, repair SQL,
  incremental (delta) checksums with persisted state, parallel multi-table runs
- transformation plane: PII masking, salted hashing, type conversion,
  regex field-pattern pipelines
- CDC plane: change-stream unwrap, soft-delete rewrite, keyed latest-LSN
  dedup, idempotent upsert apply (Structured Streaming + foreachBatch)
- advisory plane: physical-plan metrics extraction
- LLM-data-pipeline extensions: dedup (exact/minhash/ngram/embedding),
  similarity search, text analysis, multimodal column plumbing

Everything is expressed with the DataFrame/SQL API so Catalyst handles
pushdown, pruning, and join selection; Python UDFs only where built-ins
cannot express the semantics (format-preserving maskers).
"""

__version__ = "0.1.0"
