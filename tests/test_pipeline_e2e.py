"""End-to-end pipeline compositions — the flows a user of the reference
actually runs, stitched from this engine's pieces.

1. Log pipeline: custom DataSource workload → batch ingest (day-partitioned
   parquet) → reference error-analysis query → small-file compaction, with
   row counts preserved at every hop (the reference's own smoke flow,
   README.md:62-75, over our components).
2. Corpus pipeline: quality gate → near-dup clustering → canonical corpus,
   with the closure property that the deduped output has NO remaining
   near-dup pair at the same threshold (clusters were collapsed, and
   cross-cluster pairs cannot exist by construction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from api_log_iceberg_test_spark.datasource import ApiLogDataSource
from api_log_iceberg_test_spark.ingest import IngestConfig, ingest_batch
from api_log_iceberg_test_spark.maintenance import compact_parquet_table
from api_log_iceberg_test_spark.operators import dedup
from api_log_iceberg_test_spark.queries.api_logs import error_analysis
from api_log_iceberg_test_spark.schema import load_table


def test_log_pipeline_end_to_end(spark, tmp_path):
    spark.dataSource.register(ApiLogDataSource)
    logs = (
        spark.read.format("apilogs")
        .option("rows", 2000)
        .option("partitions", 4)
        .option("seed", 3)
        .option("span_days", 2)
        .load()
    )
    tgt = str(tmp_path / "warehouse")
    ingest_batch(logs, tgt, IngestConfig(flush_count=500))

    table = spark.read.parquet(tgt)
    assert table.count() == 2000

    errors = error_analysis(table, "httpStatusCode", ["name", "httpStatusCode"], threshold=400)
    got = {(r["name"], r["httpStatusCode"]): r["cnt"] for r in errors.collect()}
    want = {
        (r["name"], r["httpStatusCode"]): r["cnt"]
        for r in logs.filter(F.col("httpStatusCode") >= 400)
        .groupBy("name", "httpStatusCode")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want and got  # synthetic mix always produces some errors

    compact_parquet_table(spark, tgt, target_file_size_bytes=1 << 30)
    assert spark.read.parquet(tgt).count() == 2000


def test_corpus_pipeline_dedup_closure(spark, sf_dir):
    """After canonical dedup, re-running the SAME near-dup detector finds
    nothing: within-cluster pairs were collapsed, and a surviving
    cross-cluster pair would contradict connected components."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    assert pairs.count() > 0  # testdata plants near-dups

    comp = dedup.connected_components(pairs)
    dupes = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    canonical = docs.join(dupes, "doc_id", "left_anti")
    n_docs, n_dupes = docs.count(), dupes.count()
    assert canonical.count() == n_docs - n_dupes

    leftover = dedup.ngram_jaccard_pairs(canonical, threshold=0.5)
    assert leftover.count() == 0
