from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pagerank_project_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf0001_fixture():
    from pagerank_project_spark.datagen import ensure_fixture

    return ensure_fixture(0.001)


@pytest.fixture(scope="session")
def small_rows():
    """The reference small.csv.gz edge rows (FIXTURES.md §F1)."""
    import csv
    import gzip

    with gzip.open("/root/reference/Data/small.csv.gz", "rt") as f:
        return [(r["source"], r["target"]) for r in csv.DictReader(f)]
