"""Document-corpus sources/sinks: JSONL, CSV, and raw-text directories.

The interchange formats a training-data pipeline actually receives corpora
in, normalized onto the driver's DOCUMENTS shape
(doc_id, text, lang, source, n_chars).  Design points for scale:

* **Explicit schemas, never inference** — `spark.read.json` without a
  schema runs a full extra pass over the data to infer one; at 100 TB that
  doubles ingest cost.  Callers get the documents schema by default and can
  pass their own.
* **Narrow projection at the scan** — only requested fields reach the
  parsed rows (Jackson parses lazily per-field; pruning happens at the scan
  for Parquet-backed rereads).
* **Stable synthetic ids** — when the corpus carries no id field, ids are
  assigned by `xxhash64(text, source-file, line-offset-free salt)`; content
  addressing keeps ids stable under re-partitioning and corpus growth,
  unlike `monotonically_increasing_id` (partition-layout-dependent) or
  `zipWithIndex` (extra job + global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def _normalize(df: DataFrame, default_source: str) -> DataFrame:
    """Project any superset/subset of the documents fields onto
    DOCUMENTS_SCHEMA, deriving what is missing."""
    cols = set(df.columns)
    out = df
    content_id = F.pmod(F.xxhash64("text"), F.lit(2**62)).cast("long")
    if "doc_id" not in cols:
        out = out.withColumn("doc_id", content_id)
    else:
        # id field declared but absent in (some) records -> content-address
        out = out.withColumn("doc_id", F.coalesce(F.col("doc_id"), content_id))
    if "lang" not in cols:
        out = out.withColumn("lang", F.lit(None).cast("string"))
    if "source" not in cols:
        out = out.withColumn("source", F.lit(default_source))
    out = out.withColumn("n_chars", F.length("text").cast("long"))
    return out.select("doc_id", "text", "lang", "source", "n_chars")


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    text_field: str = "text",
    source: str = "jsonl",
) -> DataFrame:
    """Read a JSON-lines corpus directory (``*.jsonl``, optionally
    ``.gz`` — Spark decompresses by extension) onto the documents shape.

    ``schema`` defaults to ``{text: string, doc_id: long, lang: string}``;
    pass the real shape to avoid silent NULLs from typos.  No inference
    pass ever runs.
    """
    if schema is None:
        schema = T.StructType(
            [
                T.StructField(text_field, T.StringType(), True),
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("lang", T.StringType(), True),
            ]
        )
    raw = spark.read.schema(schema).json(path)
    if text_field != "text":
        raw = raw.withColumnRenamed(text_field, "text")
    return _normalize(raw, source)


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    text_field: str = "text",
    source: str = "csv",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV corpus with explicit schema (no inference scan), multiline
    quoting on so embedded newlines in quoted text fields survive."""
    if schema is None:
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField(text_field, T.StringType(), True),
            ]
        )
    raw = (
        spark.read.schema(schema)
        .option("header", header)
        .option("sep", sep)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(path)
    )
    if text_field != "text":
        raw = raw.withColumnRenamed(text_field, "text")
    return _normalize(raw, source)


def read_text_corpus(
    spark: SparkSession, path: str, whole_file: bool = True, source: str = "text"
) -> DataFrame:
    """Raw ``.txt`` directory: one document per file (``wholetext``) or per
    line.  File-per-doc keeps provenance via the input file name."""
    raw = spark.read.option("wholetext", whole_file).text(path)
    raw = raw.select(
        F.col("value").alias("text"),
        F.input_file_name().alias("source"),
    )
    out = raw.withColumn(
        "doc_id", F.pmod(F.xxhash64("text", "source"), F.lit(2**62)).cast("long")
    ).withColumn("lang", F.lit(None).cast("string"))
    return out.select(
        "doc_id", "text", "lang", "source", F.length("text").cast("long").alias("n_chars")
    )


def write_jsonl_corpus(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Write the documents shape back out as JSONL (gzip by default) —
    partitioned distributed write, one file per task."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
