"""Query predicates + search scoring (reference: pagerank.py:142-258).

Substring query syntax: whitespace-separated terms; a term starting with
``-`` is a negation. A url satisfies the query iff

  (no positive terms  OR  any positive term is a substring of url)
  AND no negated term's body is a substring of url.

Two variants, as in the reference:
- ``plain`` (new_url_satisfies_query, pagerank.py:190-207): terms used
  verbatim.
- ``expanded`` (url_satisfies_query, pagerank.py:210-258): every query
  word NOT containing '-' anywhere is expanded with its top-5 most-similar
  words, which join the positive term list. The reference uses GloVe via
  gensim (pagerank.py:12-14); no gensim/network in this sandbox →
  expansion is a pluggable ``SynonymProvider`` seam, default empty
  (SURVEY.md §2 op-20 documented deviation).

All predicates compile to Catalyst boolean expressions over
``F.col(...).contains(term)`` — no UDFs, fully codegen'd and pushable.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import Column, DataFrame, functions as F


class SynonymProvider(Protocol):
    def most_similar(self, text: str, topn: int) -> list[tuple[str, float]]: ...


class EmptySynonyms:
    """Default provider: no expansion (sandbox has no GloVe)."""

    def most_similar(self, text: str, topn: int) -> list[tuple[str, float]]:
        return []


class StaticSynonyms:
    """Dict-backed provider for tests / offline synonym tables."""

    def __init__(self, table: dict[str, list[tuple[str, float]]]):
        self.table = table

    def most_similar(self, text: str, topn: int) -> list[tuple[str, float]]:
        return self.table.get(text, [])[:topn]


def expand_terms(query: str, synonyms: SynonymProvider | None) -> list[str]:
    """Terms after expansion (url_satisfies_query, pagerank.py:236-243):
    each word with no '-' anywhere contributes its top-5 similar words."""
    terms = query.split()
    if synonyms is not None:
        for word in query.split():
            if "-" not in word:
                terms.extend(w for w, _ in synonyms.most_similar(word, topn=5))
    return terms


def _predicate_from_terms(url_col: Column, terms: list[str]) -> Column:
    positive = [t for t in terms if not t.startswith("-")]
    negated = [t[1:] for t in terms if t.startswith("-")]
    if positive:
        sat = F.lit(False)
        for t in positive:
            sat = sat | url_col.contains(t)
    else:
        sat = F.lit(True)  # num_terms==0 → satisfies (pagerank.py:201-202)
    for t in negated:
        sat = sat & ~url_col.contains(t)
    return sat


def url_satisfies_query(url_col: Column, query: str, synonyms: SynonymProvider | None = None) -> Column:
    """Expanded variant (reference url_satisfies_query, pagerank.py:210-258)."""
    return _predicate_from_terms(url_col, expand_terms(query, synonyms or EmptySynonyms()))


def new_url_satisfies_query(url_col: Column, query: str) -> Column:
    """Plain variant (reference new_url_satisfies_query, pagerank.py:190-207)."""
    return _predicate_from_terms(url_col, query.split())


def search(
    ranks: DataFrame,
    query: str,
    max_results: int = 10,
    sum_weight: float = 0.03,
    power: int = 30,
    synonyms: SynonymProvider | None = None,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Search re-ranking (reference search(), pagerank.py:142-186).

    Per node: ``number`` = 1 if the url plainly satisfies the query, plus 1
    per top-10 expansion word W of the FULL query string that plainly
    matches; ``weight`` = sum_weight for the direct match plus sim(W)**power
    per expansion match; boosted score = rank + number*weight. Result =
    nodes satisfying the expanded query, by boosted score desc, limit k.

    Physical: pure column expressions + TakeOrderedAndProject (orderBy +
    limit never fully sorts). Returns (id, score) with deterministic
    (score desc, id asc) ordering.
    """
    syn = synonyms or EmptySynonyms()
    url = F.col(id_col)
    expansion = syn.most_similar(query, topn=10) if query else []

    number = F.when(new_url_satisfies_query(url, query), 1).otherwise(0)
    weight = F.when(new_url_satisfies_query(url, query), F.lit(float(sum_weight))).otherwise(F.lit(0.0))
    for w, sim in expansion:
        hit = new_url_satisfies_query(url, w)
        number = number + F.when(hit, 1).otherwise(0)
        weight = weight + F.when(hit, F.lit(float(sim) ** power)).otherwise(F.lit(0.0))

    boosted = ranks.withColumn("score", F.col(rank_col) + number.cast("double") * weight)
    return (
        boosted.filter(url_satisfies_query(url, query, syn))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(max_results)
        .select(id_col, "score")
    )
