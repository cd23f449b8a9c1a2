"""mnemo_spark — a PySpark-native agent-memory analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference engine (sattyamjjain/mnemo — an embedded
Rust agent-memory DB; see SURVEY.md) as idiomatic Spark DataFrame/SQL
programs over a single Parquet-backed store:

- hybrid retrieval: dense cosine + relational BM25 + recency + graph
  expansion, fused by weighted Reciprocal Rank Fusion
- metadata / ACL / temporal / point-in-time predicates
- SHA-256 hash-chained audit logging with offline verification
- lifecycle batch jobs: decay, TTL sweep, consolidation, reflection,
  conflict detection, z-score quarantine
- checkpoint / branch / merge / replay versioning
- LLM-data-pipeline operators: dedup (exact / MinHash / SimHash /
  n-gram Jaccard / embedding), similarity search (brute-force + LSH),
  text analysis (lang-id, quality, token counts, fingerprints),
  multimodal binary-column plumbing
- satellite-crate interop: deal ledger (chained-HMAC sign/verify/
  reputation), Mesh namespace ACL + audit chaining, AMP 5-op envelope
  adapter with HITL approval, CMA markdown-tree shim, Letta state
  mapping, code-mode recall budgeting, attention-state blob store

Design stance (SURVEY.md §7): DataFrames everywhere, no sidecar
indexes, every operator a pure transformation so Catalyst plans it;
Python only via Arrow-batched pandas UDFs where Spark genuinely lacks
the primitive (sequential hash-chain assignment, pluggable embedders).
"""

__version__ = "0.1.0"
