"""Query predicate + search scoring (reference pagerank.py:142-258).

The 8 doctests of url_satisfies_query (pagerank.py:217-232) ported
verbatim (FIXTURES.md §F4) — exact under empty expansion — plus expansion
via a static synonym table and the search() boost arithmetic."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_project_spark.functions.query import (
    StaticSynonyms,
    new_url_satisfies_query,
    search,
    url_satisfies_query,
)

URL = "www.lawfareblog.com/covid-19-speech"
DOCTESTS = [  # (query, expected) — pagerank.py:217-232
    ("covid", True),
    ("coronavirus covid", True),
    ("coronavirus", False),
    ("covid -speech", False),
    ("covid -corona", True),
    ("-speech", False),
    ("-corona", True),
    ("", True),
]


def eval_pred(spark, col_expr) -> bool:
    return spark.range(1).select(col_expr.alias("x")).first()["x"]


@pytest.mark.parametrize("query,expected", DOCTESTS)
def test_url_satisfies_query_doctests(spark, query, expected):
    assert eval_pred(spark, url_satisfies_query(F.lit(URL), query)) is expected
    assert eval_pred(spark, new_url_satisfies_query(F.lit(URL), query)) is expected


def test_expansion_changes_coronavirus_case(spark):
    """With a synonym table mapping coronavirus→covid, the expanded variant
    matches where the plain one doesn't (reference GloVe behavior)."""
    syn = StaticSynonyms({"coronavirus": [("covid", 0.9)]})
    assert eval_pred(spark, url_satisfies_query(F.lit(URL), "coronavirus", syn)) is True
    assert eval_pred(spark, new_url_satisfies_query(F.lit(URL), "coronavirus")) is False


def test_hyphenated_words_not_expanded(spark):
    """A word containing '-' anywhere is skipped by expansion
    (pagerank.py:238 — even a trailing hyphen inside the word)."""
    syn = StaticSynonyms({"covid-x": [("speech", 0.9)], "covid": [("speech", 0.9)]})
    # 'covid-x' not expanded → no positive match from expansion
    assert eval_pred(spark, url_satisfies_query(F.lit("www.a.com/other"), "covid-x", syn)) is False
    # 'covid' IS expanded → 'speech' matches
    assert eval_pred(spark, url_satisfies_query(F.lit(URL), "covid", syn)) is True


def test_search_boost_and_topk(spark):
    """search() semantics (pagerank.py:142-186): score = rank + number*weight,
    with number/weight accumulated over direct + expansion matches."""
    ranks = spark.createDataFrame(
        pd.DataFrame(
            {"id": ["a.com/covid", "a.com/corona-covid", "a.com/other"], "rank": [0.1, 0.2, 0.9]}
        )
    )
    syn = StaticSynonyms({"covid": [("corona", 0.5)]})
    out = search(ranks, "covid", max_results=10, sum_weight=0.03, power=2, synonyms=syn).collect()
    got = {r["id"]: r["score"] for r in out}
    # a.com/covid: direct hit only → number=1, weight=0.03 → 0.1 + 0.03
    assert got["a.com/covid"] == pytest.approx(0.13)
    # a.com/corona-covid: direct + expansion ('corona' top-10 of query) →
    # number=2, weight=0.03+0.5**2 → 0.2 + 2*0.28
    assert got["a.com/corona-covid"] == pytest.approx(0.2 + 2 * (0.03 + 0.25))
    # a.com/other fails the expanded predicate → excluded
    assert "a.com/other" not in got
    # ordering: boosted scores desc
    assert [r["id"] for r in out] == ["a.com/corona-covid", "a.com/covid"]


def test_search_no_query_returns_topk_by_rank(spark):
    ranks = spark.createDataFrame(pd.DataFrame({"id": ["u1", "u2", "u3"], "rank": [0.3, 0.5, 0.2]}))
    out = search(ranks, "", max_results=2).collect()
    # empty query: every url satisfies; number=1, weight=sum_weight
    assert [r["id"] for r in out] == ["u2", "u1"]
    assert out[0]["score"] == pytest.approx(0.5 + 0.03)
