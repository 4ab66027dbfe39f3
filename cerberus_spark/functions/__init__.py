"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing.  All expression-level
(JVM/codegen) where possible; Arrow-batched pandas UDFs otherwise."""
