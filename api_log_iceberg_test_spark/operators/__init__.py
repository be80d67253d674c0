"""LLM-data-pipeline operators (extension surface, SURVEY.md §7 Phase 4).

The reference has no user-extensibility or data-processing operators beyond
SQL (SURVEY.md §2.5); these modules add the pipeline ops a 100 TB training-
data workload needs, each Spark-first:

- :mod:`dedup` — exact, normalized-hash, n-gram Jaccard, MinHash-LSH, SimHash
- :mod:`similarity` — brute-force cosine top-k, IVF-style partitioned ANN
- :mod:`text` — token counting, quality scoring, language-ID, fingerprinting
- :mod:`multimodal` — binary media columns: schema, batching, decode stubs
- :mod:`registry` — QUERIES/ORACLE entries contributed to __spark_entry__
"""
