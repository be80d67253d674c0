"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo ``Praveenrajmani/api-log-iceberg-test``.

The reference is an integration harness around a streaming S3-API-log →
Iceberg ingest pipeline queried through SQL (see SURVEY.md). This package
re-expresses that surface Spark-first:

- ``session``    — SparkSession builder (optional Iceberg catalog config)
- ``schema``     — the 14-column api-log schema (reference README.md:172-189)
- ``generator``  — synthetic weighted api-log workload (generate-api-logs.sh:74-120)
- ``ingest``     — Structured Streaming ingest with flush/commit cadence knobs
- ``maintenance``— compaction / snapshot-expiry style table maintenance
- ``queries``    — the reference's SQL query surface + analytic extensions
- ``operators``  — 100 TB-scale LLM-data-pipeline ops (dedup, similarity,
                   text analysis, multimodal)
- ``streaming``  — event-time windowed aggregation, sessionization
"""

__version__ = "0.1.0"
