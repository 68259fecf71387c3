"""CSV edge-list ingest with reference parity (reference: pagerank.py:18-47).

Reads the reference's gzip CSV format — header ``source,target``, one
directed edge per row (README.md:37-59) — reproducing the reference's
ingest-order semantics:

- ``max_nnz`` caps RAW input rows (``if i > max_nnz: break``,
  pagerank.py:30-31 — i.e. rows 0..max_nnz inclusive, counted BEFORE the
  URL filter).
- URL regex filter drops an edge if source OR target matches
  ``.*((/$)|(/.*/)).*`` (pagerank.py:32-35); a dropped row never registers
  its URLs as vertices.

Spark notes: a ``.csv.gz`` is non-splittable → single input partition, so
``monotonically_increasing_id`` is the file row order; for splittable
multi-part inputs the cap is per-file-order approximate (the knob exists
for parity on the single-file fixtures only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

URL_FILTER_REGEX = r".*((/$)|(/.*/)).*"  # pagerank.py:33


def read_edgelist_csv(
    spark: SparkSession,
    path: str,
    apply_url_filter: bool = True,
    max_nnz: int | None = None,
) -> DataFrame:
    """→ (src: string, dst: string), filters applied in reference order."""
    df = (
        spark.read.option("header", True)
        .csv(path)
        .select(F.col("source").alias("src"), F.col("target").alias("dst"))
    )
    if max_nnz is not None:
        df = df.withColumn("_i", F.monotonically_increasing_id()).filter(
            F.col("_i") <= max_nnz
        ).drop("_i")
    if apply_url_filter:
        df = df.filter(
            ~F.col("src").rlike(URL_FILTER_REGEX) & ~F.col("dst").rlike(URL_FILTER_REGEX)
        )
    return df
