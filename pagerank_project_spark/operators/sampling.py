"""Deterministic hash-bucket sampling — the corpus-downsampling /
corpus-mixing primitive a training-data pipeline runs before anything
else at 100 TB.

Why hash buckets and not ``df.sample()``: Bernoulli sampling is tied to
partition-level RNG state, so the kept set changes with partitioning,
retries, and Spark version — useless for reproducible corpus builds and
for oracle checks. A hash bucket (``md5(key ‖ salt)`` → first 8 hex chars
→ int mod 100) is a pure per-row expression: the kept set is a function
of the DATA only, identical on any cluster layout, resumable, and
joins/anti-joins cleanly against later pipeline stages ("which docs were
dropped?"). md5 (not xxhash64) so the exact same bucket is computable in
any engine for cross-checks (the DuckDB oracle replays it verbatim).

Scale: pure Catalyst expressions inside whole-stage codegen — no shuffle,
no Python, filter sits directly on the parquet scan. The per-stratum
variant is one CASE expression over a literal map (strata counts are
config-sized: languages, sources — never data-sized).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 100) from the md5 of the key (+ salt).

    ``conv`` parses the first 8 hex chars (32 bits — fits a long, no
    overflow wrap to worry about); the salt decorrelates independent
    samples drawn from the same key space.
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 100


def hash_sample(df: DataFrame, key_col: str, pct: int, salt: str = "") -> DataFrame:
    """Keep rows whose hash bucket falls below ``pct`` (an integer
    percentage) — a deterministic ~pct% sample, reproducible anywhere."""
    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be in [0, 100], got {pct}")
    return df.filter(hash_bucket(F.col(key_col), salt) < pct)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum: Column,
    rates: dict[str, int],
    default_pct: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — corpus mixing ("keep 80% of
    English, 20% of everything else"). ``rates`` maps stratum value →
    integer percentage; strata absent from the map fall back to
    ``default_pct``. One codegen'd CASE expression; no shuffle."""
    for k, v in rates.items():
        if not 0 <= v <= 100:
            raise ValueError(f"rate for {k!r} must be in [0, 100], got {v}")
    pct = F.lit(default_pct)
    for value, p in sorted(rates.items()):
        pct = F.when(stratum == value, F.lit(p)).otherwise(pct)
    return df.filter(hash_bucket(F.col(key_col), salt) < pct)
