"""Iceberg-emulated source-code table reader.

The engine's primary input is "an Iceberg table of source-code
repositories" (BASELINE.json input_hint). No Iceberg jars exist in this
sandbox (SURVEY.md §7), so fixtures use an emulated layout —
``source_table/data/*.parquet`` + ``source_table/_manifest.json`` holding
schema/snapshot metadata — behind the same read API a real catalog would
serve. ``read_source_table`` validates the manifest (schema + row count)
so a truncated/partial write is detected before any job runs; with real
Iceberg the same function body becomes ``spark.read.format("iceberg")``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

EXPECTED_COLUMNS = ["repo", "path", "commit", "lang", "content", "content_sha256"]


class ManifestError(ValueError):
    pass


def read_manifest(fixture_dir: str) -> dict:
    path = os.path.join(fixture_dir, "source_table", "_manifest.json")
    if not os.path.exists(path):
        raise ManifestError(f"no _manifest.json under {fixture_dir}/source_table")
    with open(path) as f:
        return json.load(f)


def read_source_table(
    spark: SparkSession, fixture_dir: str, verify_rows: bool = False
) -> DataFrame:
    """Read the source-code table, validating the snapshot manifest."""
    manifest = read_manifest(fixture_dir)
    cols = list(manifest.get("schema", {}))
    missing = [c for c in EXPECTED_COLUMNS if c not in cols]
    if missing:
        raise ManifestError(f"manifest schema missing columns {missing}")
    df = spark.read.parquet(os.path.join(fixture_dir, "source_table", "data"))
    df_missing = [c for c in EXPECTED_COLUMNS if c not in df.columns]
    if df_missing:
        raise ManifestError(f"data files missing columns {df_missing}")
    if verify_rows:
        got = df.count()
        if got != manifest["rows"]:
            raise ManifestError(f"row count {got} != manifest {manifest['rows']}")
    return df
