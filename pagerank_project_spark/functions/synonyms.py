"""Corpus-derived synonym table — the offline stand-in for the reference's
GloVe query expansion (reference pagerank.py:12-14, :241-243:
``gensim.downloader.load('glove-wiki-gigaword-300')`` + ``most_similar``).

No gensim/network in this sandbox, so the engine computes distributional
similarity FROM THE CORPUS ITSELF, fully engine-side and deterministic:

1. doc–word incidence: distinct normalized words per document (set
   semantics, document-level co-occurrence);
2. vocabulary cut: words appearing in ≥ ``min_count`` docs (bounds the
   posting lists — the scale guard for the self-join);
3. PPMI weights: ppmi(a,b) = max(0, ln(N·c_ab / (c_a·c_b))) over
   co-occurring word pairs — each word's sparse context vector;
4. cosine between context vectors via a self-join on the shared context
   word (bucketed by context — never all-pairs over the vocabulary);
5. per-word top-n by (sim desc, neighbor asc), sim rounded to 6 dp.

Everything is Catalyst expressions + joins (no UDFs), and every step is
ANSI-SQL-expressible — the ``synonym_topk`` contract query has an exact
DuckDB oracle. ``TableSynonyms`` adapts the table to the
``SynonymProvider`` protocol consumed by functions/query.py, so the
reference's expanded-search path (op-20) runs end-to-end with a provider
that was actually *learned* from data, not hand-seeded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def doc_words(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc, word) incidence — distinct normalized words per document."""
    from pagerank_project_spark.operators.textstats import normalized_text

    toks = F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))
    return (
        docs.select(F.col(id_col).alias("_id"), F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
    )


def build_synonym_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    topn: int = 5,
) -> DataFrame:
    """→ (word, neighbor, sim): top-``topn`` distributional neighbors per
    vocabulary word, cosine over PPMI context vectors."""
    n_docs = docs.count()
    dw = doc_words(docs, text_col, id_col)
    wc = dw.groupBy("word").agg(F.count("*").alias("cnt")).filter(F.col("cnt") >= min_count)
    dwf = dw.join(F.broadcast(wc), "word").select("_id", "word", "cnt")

    # co-occurrence counts for a < b (one direction; mirrored below)
    pairs = (
        dwf.alias("x")
        .join(dwf.alias("y"), "_id")
        .filter(F.col("x.word") < F.col("y.word"))
        .groupBy(
            F.col("x.word").alias("a"),
            F.col("y.word").alias("b"),
            F.col("x.cnt").alias("ca"),
            F.col("y.cnt").alias("cb"),
        )
        .agg(F.count("*").alias("cab"))
    )
    ppmi = pairs.select(
        "a",
        "b",
        F.greatest(
            F.lit(0.0),
            F.log(F.lit(float(n_docs)) * F.col("cab") / (F.col("ca") * F.col("cb"))),
        ).alias("w"),
    ).filter(F.col("w") > 0)
    # symmetric context vectors: (word, context, weight)
    vec = ppmi.select(F.col("a").alias("word"), F.col("b").alias("ctx"), "w").unionByName(
        ppmi.select(F.col("b").alias("word"), F.col("a").alias("ctx"), "w")
    )
    norms = vec.groupBy("word").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    sims = (
        vec.alias("p")
        .join(vec.alias("q"), "ctx")
        .filter(F.col("p.word") != F.col("q.word"))
        .groupBy(F.col("p.word").alias("word"), F.col("q.word").alias("neighbor"))
        .agg(F.sum(F.col("p.w") * F.col("q.w")).alias("dot"))
        .join(F.broadcast(norms).withColumnRenamed("word", "word").withColumnRenamed("nrm", "n1"), "word")
        .join(
            F.broadcast(norms.select(F.col("word").alias("neighbor"), F.col("nrm").alias("n2"))),
            "neighbor",
        )
        .select("word", "neighbor", F.round(F.col("dot") / (F.col("n1") * F.col("n2")), 6).alias("sim"))
    )
    wnd = Window.partitionBy("word").orderBy(F.desc("sim"), F.asc("neighbor"))
    return (
        sims.withColumn("_rn", F.row_number().over(wnd))
        .filter(F.col("_rn") <= topn)
        .drop("_rn")
    )


class TableSynonyms:
    """SynonymProvider over a (word, neighbor, sim) table — the engine's
    drop-in for the reference's GloVe ``most_similar``. The vocabulary is
    collected once; an over-budget table RAISES rather than silently and
    nondeterministically truncating (same contract as
    ``similarity.brute_force_topk``'s QUERY_BROADCAST_LIMIT guard —
    a provider missing arbitrary rows would corrupt expansion results)."""

    def __init__(self, syn_df: DataFrame, max_vocab: int = 1_000_000):
        cap = max_vocab * 5
        rows = syn_df.select("word", "neighbor", "sim").limit(cap + 1).collect()
        if len(rows) > cap:
            raise ValueError(
                f"synonym table exceeds the driver collect budget ({cap} rows); "
                "raise max_vocab, raise build_synonym_table(min_count=...), or "
                "pre-filter the table to the query vocabulary"
            )
        table: dict[str, list[tuple[str, float]]] = {}
        for r in rows:
            table.setdefault(r["word"], []).append((r["neighbor"], float(r["sim"])))
        for w in table:
            table[w].sort(key=lambda t: (-t[1], t[0]))
        self.table = table

    def most_similar(self, text: str, topn: int) -> list[tuple[str, float]]:
        return self.table.get(text, [])[:topn]
