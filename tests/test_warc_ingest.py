"""WARC -> flagship ingest integration: archives in, partitioned
assignments out, fingerprint resume, and the input-hint byte-identical
text invariant through the whole archive cycle."""

from pyspark.sql import functions as F

from hand_index_spark.cli.ingest_warc_main import main
from hand_index_spark.operators.multimodal import attach_html_binary
from hand_index_spark.pipelines.assign_tiles import web_pages_from_documents
from hand_index_spark.sources.warc import read_warc, write_warc_files

SF_DIR = "/root/testdata/sf0.001"


def _write_archive(spark, warc_dir: str) -> int:
    pages = attach_html_binary(web_pages_from_documents(spark, SF_DIR))
    pages = pages.withColumn("warc_ts_iso", F.lit("2025-01-01T00:00:00Z"))
    manifest = write_warc_files(
        pages.select("doc_id", "url", "warc_ts_iso", "html"), warc_dir, n_files=2
    ).collect()
    return sum(r["n_records"] for r in manifest)


def test_ingest_warc_cli_and_resume(spark, tmp_path):
    warc_dir = str(tmp_path / "warc")
    n_records = _write_archive(spark, warc_dir)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert n_records == n_docs

    out_dir = str(tmp_path / "index")
    args = ["--warc-glob", warc_dir + "/*.warc.gz", "--output-dir", out_dir]
    r1 = main(args, spark=spark)
    assert r1["n_assignments"] == n_docs
    assert r1["stages"] == ["assign", "rollup"] and not r1["resumed"]

    r2 = main(args, spark=spark)  # second run: both stages skipped
    assert r2["resumed"] and r2["n_assignments"] == n_docs


def test_warc_cycle_preserves_text_bytes(spark, tmp_path):
    warc_dir = str(tmp_path / "warc")
    _write_archive(spark, warc_dir)
    parsed = read_warc(spark, warc_dir + "/*.warc.gz").select(
        F.regexp_extract("url", r"/d(\d+)$", 1).cast("long").alias("doc_id"),
        F.regexp_replace(F.decode(F.col("html"), "utf-8"), "<[^>]*>", "").alias(
            "extracted"
        ),
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    n_same = (
        parsed.join(docs, "doc_id")
        .filter(F.sha2("extracted", 256) == F.sha2("text", 256))
        .count()
    )
    assert n_same == n_docs
