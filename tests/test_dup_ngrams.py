"""Cross-document duplicate n-gram span coverage (textstats.dup_ngram_profile)."""

from __future__ import annotations

import re

from pagerank_project_spark.operators.textstats import dup_ngram_profile

SHARED = "the quick brown fox jumps over the lazy dog near the river bank"
DOCS = [
    (1, f"Intro words here. {SHARED} And a unique tail for doc one."),
    (2, f"{SHARED} completely different continuation text follows here now."),
    (3, "nothing here repeats across documents at all in any way whatsoever today"),
    (4, "too short"),
    (5, f"prefix {SHARED} suffix {SHARED} end"),  # shared paragraph twice
]


def _norm_tokens(text):
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", text.lower())).strip()
    return t.split(" ")


def _replica(docs, n, min_docs=2):
    grams = {}  # gram -> set of doc ids
    pos = {}  # doc -> list of (start, gram)
    ntok = {}
    for did, text in docs:
        tk = _norm_tokens(text)
        ntok[did] = len(tk)
        pos[did] = []
        for i in range(len(tk) - n + 1):
            g = " ".join(tk[i : i + n])
            grams.setdefault(g, set()).add(did)
            pos[did].append((i + 1, g))
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = {}
    for did, _ in docs:
        starts = pos[did]
        dups = [s for s, g in starts if g in dup]
        covered = set()
        for s in dups:
            covered.update(range(s, s + n))
        out[did] = (
            ntok[did],
            len(starts),
            len(dups),
            len(covered),
            round(len(covered) / max(ntok[did], 1), 6),
        )
    return out


def test_dup_ngram_profile_matches_replica(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for n in (4, 8):
        got = {
            r.doc_id: (r.n_tokens, r.n_ngrams, r.n_dup_ngrams, r.covered_tokens, r.dup_token_frac)
            for r in dup_ngram_profile(df, n=n).collect()
        }
        assert got == _replica(DOCS, n)


def test_dup_ngram_profile_short_docs_report_zeros(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    row = {r.doc_id: r for r in dup_ngram_profile(df, n=8).collect()}[4]
    assert (row.n_ngrams, row.n_dup_ngrams, row.covered_tokens, row.dup_token_frac) == (0, 0, 0, 0.0)
    assert row.n_tokens == 2


def test_dup_ngram_profile_spans_union_not_sum(spark):
    """Doc 5 contains the shared sentence twice with overlapping dup
    n-grams — covered_tokens must be the UNION of spans, strictly less
    than n_dup_ngrams * n."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    row = {r.doc_id: r for r in dup_ngram_profile(df, n=8).collect()}[5]
    assert row.n_dup_ngrams > 1
    assert row.covered_tokens < row.n_dup_ngrams * 8
    assert row.covered_tokens <= row.n_tokens


def test_dup_ngram_profile_min_docs_three_drops_pairs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: r.n_dup_ngrams for r in dup_ngram_profile(df, n=8, min_docs=3).collect()}
    assert got == {r: v[2] for r, v in _replica(DOCS, 8, min_docs=3).items()}


def test_corpus_line_dedup_removes_boilerplate_keeps_order(spark):
    from pagerank_project_spark.operators.textstats import corpus_line_dedup

    docs = [
        (1, "COOKIE BANNER\nreal content one\nfooter text\nunique tail 1"),
        (2, "COOKIE BANNER\nreal content two\nfooter text"),
        (3, "totally original document\nnothing shared here"),
        (4, "COOKIE BANNER\n\n  \nfooter text"),  # all boilerplate + blanks
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_lines, r.n_removed)
           for r in corpus_line_dedup(df).collect()}
    assert got[1] == ("real content one\nunique tail 1", 4, 2)
    assert got[2] == ("real content two", 3, 2)
    assert got[3] == ("totally original document\nnothing shared here", 2, 0)
    assert got[4] == ("", 2, 2)


def test_corpus_line_dedup_min_docs_three(spark):
    from pagerank_project_spark.operators.textstats import corpus_line_dedup

    docs = [
        (1, "twice shared\nthrice shared\nown 1"),
        (2, "twice shared\nthrice shared\nown 2"),
        (3, "thrice shared\nown 3"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.clean_text for r in corpus_line_dedup(df, min_docs=3).collect()}
    # only 'thrice shared' crosses the threshold
    assert got[1] == "twice shared\nown 1"
    assert got[3] == "own 3"
