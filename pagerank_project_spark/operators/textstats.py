"""Text-analysis operators for training-data pipelines.

Beyond-reference operators (driver brief): language-ID (stopword n-gram
heuristic), quality scoring (length/punct/stopword ratios), token
counting (whitespace + BPE-ish regex), and document fingerprinting. All
are pure Catalyst expressions (regexp/array functions — JVM-side,
whole-stage-codegen'd, no UDFs) and each has an exact DuckDB-SQL oracle
(same regexes, same arithmetic) wired in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny per-language stopword lists; the heuristic is the operator, the
# lists are a config surface (swap in real ones at deployment)
STOPWORDS = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "mit"],
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
}


def _stopword_pattern(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+"))


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish pre-tokenizer count: letter runs, digit runs, single punct."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_count(text: Column, lang: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(_stopword_pattern(lang)), F.lit(0)))


def quality_score(text: Column) -> Column:
    """Heuristic quality ∈ [0,1]: rewards moderate length, words 3-10
    chars on average, low punctuation, some English stopword presence.
    (Shape follows public C4/Gopher-style filters: length + symbol-ratio +
    stopword checks.)"""
    ntok = token_count(text).cast("double")
    mean_wlen = F.length(F.regexp_replace(text, r"\s+", "")) / F.greatest(ntok, F.lit(1.0))
    len_term = F.least(ntok / F.lit(20.0), F.lit(1.0))
    wlen_term = F.when((mean_wlen >= 3) & (mean_wlen <= 10), 1.0).otherwise(0.5)
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_term = F.least(stopword_count(text, "en").cast("double") / F.greatest(ntok, F.lit(1.0)) * 5.0, F.lit(1.0))
    return F.round((len_term + wlen_term + punct_term + stop_term) / 4.0, 6)


def lang_id(text: Column) -> Column:
    """Stopword-hit language ID over {de,en,es,fr}; argmax hits, ties →
    lexicographically smallest lang; zero hits everywhere → 'und'."""
    hits = [(lang, stopword_count(text, lang)) for lang in sorted(STOPWORDS)]
    best_lang, best_hits = F.lit("und"), F.lit(0)
    # iterate in REVERSE lang order with >= so on ties the alphabetically
    # SMALLEST lang (processed last) wins; > 0 guard keeps 'und' for no hits
    for lang, h in reversed(hits):
        cond = (h >= best_hits) & (h > 0)
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(cond, h).otherwise(best_hits)
    return best_lang


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", " "), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (md5 exists in both Spark and DuckDB → portable oracle)."""
    return F.md5(normalized_text(text))


def text_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        id_col,
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )


def tfidf_topk(docs: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k TF-IDF terms per document — the classic sparse
    feature-extraction step of a training-data pipeline.

    tokenize (lowercase ``[a-z0-9]+`` runs) → tf = per-(doc, term) count →
    df = per-term doc frequency → score = tf · ln(N/df) → per-doc top-k.
    Output (doc_id, term, tfidf, rnk), rnk 1..k.

    Scale shape: tf and df are map-side-combined groupBys (the df groupBy
    keys on term — hot common terms are a count agg, combiner-friendly,
    never a row buffer); tf⋈df is a shuffle join on term (df is |vocab|
    rows — NOT broadcast: web-scale vocab outgrows any broadcast budget);
    the per-doc top-k window partitions on doc_id where row counts are
    bounded by document length, so no skew hazard. Everything is pure
    Catalyst — zero Python in the hot path.

    Determinism across engines: the score is ROUNDED to 6 decimals BEFORE
    ranking in both this plan and the DuckDB oracle, so 1-ulp ln()
    differences (JVM vs libm) can't flip the selected set; rounded ties
    break on term ascending."""
    from pyspark.sql import Window

    n_docs = float(docs.count())
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "term").select(
        id_col,
        "term",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def quality_filter_per_lang(
    docs: DataFrame,
    keep_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_frac: float | None = None,
) -> DataFrame:
    """Per-language quality-percentile corpus filter — keep the top
    ``keep_frac`` of each language's documents by quality score (the
    C4/Gopher-style curation stage that equalizes quality ACROSS
    languages instead of letting one language's score distribution set a
    global cutoff).

    Output (doc_id, lang_pred, quality, rn, n_lang): the kept rows with
    their per-language quality rank and language size. The cutoff is an
    integer row count ceil(keep_frac · n_lang) over a TOTAL order
    (quality desc, doc_id asc), so the kept SET is deterministic and
    engine-portable: quality is already bit-identical cross-engine (its
    arithmetic is oracle-matched in `text_profile`) and ties inside one
    quality value resolve by doc id. Both windows partition on the
    language (bounded cardinality — a config-sized set, never a skew
    hazard at any corpus size); everything is pure Catalyst.

    ``max_dup_line_frac``: optional Gopher-style repetition pre-filter —
    documents whose duplicate-line fraction (see ``repetition_profile``)
    exceeds it are dropped BEFORE the percentile windows, so boilerplate
    can't crowd a language's quality quantiles. The predicate is a
    row-local array expression riding the same scan: zero extra shuffle."""
    from pyspark.sql import Window

    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    t = F.col(text_col)
    if max_dup_line_frac is not None:
        docs = docs.filter(dup_line_frac(t) <= max_dup_line_frac)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
    )
    w_rank = Window.partitionBy("lang_pred").orderBy(F.desc("quality"), F.asc("doc_id"))
    w_all = Window.partitionBy("lang_pred")
    return (
        base.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n_lang", F.count("*").over(w_all))
        .filter(F.col("rn") <= F.ceil(F.lit(keep_frac) * F.col("n_lang")))
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher/C4-style repetition rules)
# ---------------------------------------------------------------------------

def _nonempty_segments(text: Column, sep: str) -> Column:
    """Trimmed, non-empty segments of ``text`` split on ``sep`` — pure
    array expression, no explode."""
    return F.filter(F.transform(F.split(text, sep), lambda x: F.trim(x)), lambda x: x != "")


def _dup_frac(segs: Column) -> Column:
    """Fraction of segments that are repeats beyond the first occurrence:
    (n − n_distinct) / n; 0 for empty. Exact integer ratio in float64."""
    n = F.size(segs)
    return (n - F.size(F.array_distinct(segs))) / F.greatest(n, F.lit(1)).cast("double")


def _dup_char_frac(segs: Column) -> Column:
    """Fraction of segment CHARACTERS in repeat occurrences: duplicate-heavy
    long lines weigh more than duplicated short separators (the Gopher
    'fraction of characters in duplicate lines' signal)."""
    chars = lambda a: F.aggregate(a, F.lit(0), lambda acc, x: acc + F.length(x))  # noqa: E731
    total = chars(segs)
    return (total - chars(F.array_distinct(segs))) / F.greatest(total, F.lit(1)).cast("double")


def dup_line_frac(text: Column) -> Column:
    """Row-local duplicate-line fraction — usable directly as a filter
    predicate (quality_filter_per_lang composes it with zero extra shuffle)."""
    return _dup_frac(_nonempty_segments(text, r"\n"))


def repetition_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals — the public Gopher/C4-style rules a
    corpus filter applies before training (beyond the reference, which has
    no text layer; driver-brief quality-scoring extension):

      dup_line_frac       (n_lines − n_distinct_lines) / n_lines
      dup_line_char_frac  duplicate-line characters / line characters
      dup_para_frac       same count fraction over '\\n\\n' paragraphs
      top_bigram_frac     occurrences of the most frequent word bigram /
                          total bigram occurrences (boilerplate detector)

    Scale shape: the line/paragraph metrics are ROW-LOCAL array expressions
    (split → trim/filter → array_distinct → aggregate) — whole-stage
    codegen, zero shuffle, no UDFs. The bigram mode needs a per-(doc,
    bigram) multiset count, which arrays would make quadratic per row for
    long documents; it runs as two map-side-combined groupBys keyed by
    doc_id (bounded per-doc cardinality, no cross-doc skew) plus one join
    back on doc_id. All outputs are exact integer ratios in float64 →
    the DuckDB oracle matches bit-for-bit before the defensive 6dp round."""
    t = F.col(text_col)
    lines = _nonempty_segments(t, r"\n")
    paras = _nonempty_segments(t, r"\n\n")
    row_local = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.round(_dup_frac(lines), 6).alias("dup_line_frac"),
        F.round(_dup_char_frac(lines), 6).alias("dup_line_char_frac"),
        F.size(paras).alias("n_paras"),
        F.round(_dup_frac(paras), 6).alias("dup_para_frac"),
    )

    toks = F.split(normalized_text(t), " ")
    cnt = F.size(toks) - 1
    pairs = F.zip_with(
        F.slice(toks, 1, cnt), F.slice(toks, 2, cnt), lambda a, b: F.concat_ws(" ", a, b)
    )
    bg = docs.select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("bg"))
    top = (
        bg.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c") / F.sum("c")).alias("_tbf"))
    )
    return row_local.join(top, "doc_id", "left").select(
        "doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac", "n_paras",
        "dup_para_frac",
        F.round(F.coalesce(F.col("_tbf"), F.lit(0.0)), 6).alias("top_bigram_frac"),
    )


def lm_surprisal(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document mean bigram surprisal under the corpus's OWN bigram
    MLE model — the CCNet-style LM quality signal (documents whose word
    transitions are improbable under the corpus model are boilerplate,
    lists, or noise): score(d) = mean over d's bigrams of −ln p(w2|w1),
    with p = c(w1,w2)/c(w1,·) from ``bigram_lm_stats``'s dataflow.

    → (doc_id, n_bigrams, avg_surprisal). Docs with < 2 tokens have no
    bigrams and are absent (mirror that in any oracle).

    Scale shape: the corpus LM (c, ctx) is two map-side-combined groupBys;
    the per-doc bigram stream joins the LM on (w1, w2) — a SHUFFLE join
    (the LM table is |bigram vocab| rows, never broadcast at web scale) —
    then one map-side-combined per-doc agg. Every doc bigram exists in
    the model by construction (the model came from the same corpus), so
    the join is inner and lossless. Cross-engine: p is an exact integer
    ratio; ln() can differ by 1 ulp between libms, but the per-doc MEAN
    of ~10²-10⁴ such terms moves ≲1e-13 relative — far inside the 6dp
    round (the tfidf lesson applied to a sum instead of a rank)."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    cnt = F.size(toks) - 1
    pairs = F.zip_with(
        F.slice(toks, 1, cnt),
        F.slice(toks, 2, cnt),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_bg = docs.select(F.col(id_col).alias("doc_id"), F.explode(pairs).alias("s")).select(
        "doc_id", "s.w1", "s.w2"
    )
    c = doc_bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    ctx = c.groupBy("w1").agg(F.sum("c").alias("ctx"))
    lm = c.join(ctx, "w1").select("w1", "w2", (F.col("c") / F.col("ctx")).alias("p"))
    return (
        doc_bg.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log("p")), 6).alias("avg_surprisal"),
        )
    )


def bigram_lm_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram language-model statistics: (w1, w2, c, p) where c is
    the corpus bigram count (MULTISET — LM counts, unlike dedup's distinct
    shingles) and p = c(w1,w2) / Σ_w c(w1,w) the conditional MLE
    probability. The n-gram count table is the classic LM / data-quality
    artifact (perplexity filters, boilerplate detection).

    Scale shape: the bigram stream is a row-level zip of two token-array
    slices (pure Catalyst, subexpression-eliminated like dedup.shingles);
    both aggs are map-side-combined groupBys and the context join keys on
    w1 (hot head-words are a count agg, combiner-friendly). p is an exact
    integer ratio in float64 → the DuckDB oracle matches bit-for-bit."""
    toks = F.split(normalized_text(F.col(text_col)), " ")
    cnt = F.size(toks) - 1
    pairs = F.zip_with(
        F.slice(toks, 1, cnt),
        F.slice(toks, 2, cnt),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = docs.select(F.explode(pairs).alias("s")).select("s.w1", "s.w2")
    c = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    ctx = c.groupBy("w1").agg(F.sum("c").alias("ctx"))
    return c.join(ctx, "w1").select(
        "w1", "w2", "c", F.round(F.col("c") / F.col("ctx"), 6).alias("p")
    )


def dup_ngram_profile(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicate n-gram SPAN coverage — the ExactSubstr-style
    signal (Lee et al., "Deduplicating Training Data Makes Language Models
    Better") at word-n-gram granularity: for each document, what fraction
    of its tokens sits inside an n-gram that also appears in >= min_docs
    distinct documents. Complements repetition_profile (WITHIN-doc
    repetition) and minhash/simhash (whole-doc near-dup): this catches the
    shared boilerplate PARAGRAPH pasted into thousands of otherwise-unique
    pages, which doc-level dedup keeps and in-doc repetition misses.

    → (doc_id, n_tokens, n_ngrams, n_dup_ngrams, covered_tokens,
       dup_token_frac) for every input doc (short docs report zeros);
    covered_tokens = |union of the duplicated n-grams' spans| via distinct
    covered positions, dup_token_frac = covered_tokens / n_tokens — exact
    integer ratios, so the DuckDB oracle matches bit-for-bit inside the
    defensive 6dp round.

    Scale shape: the positioned n-gram stream is one posexplode row per
    token (n-gram text is hashed to md5 IN THE SAME PROJECTION, so ~32-byte
    digests shuffle, never n-token strings); the duplicated-gram set is a
    distinct on (g, doc) + one map-side-combined count (both hash aggs,
    no skew hazard beyond a genuinely viral n-gram, which is exactly a
    count agg's best case); the join back keys on g and is NEVER broadcast
    (web-scale dup vocab); the span-union explode costs n rows per
    DUPLICATED start only, and the distinct-position count partitions by
    doc_id (bounded by document length). No Python anywhere.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    t = F.col(text_col)
    toks = F.split(normalized_text(t), " ")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("tk"), F.size(toks).alias("n_tokens")
    )
    # (doc, start pos 1-based, md5 of the n-gram) — one row per n-gram
    grams = base.filter(F.col("n_tokens") >= n).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("n_tokens") - (n - 1)),
                lambda i: F.md5(F.array_join(F.slice(F.col("tk"), i, n), " ")),
            )
        ).alias("pos0", "g"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    dup = (
        grams.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("g")
    )
    dup_starts = grams.join(dup, "g")
    covered = (
        dup_starts.select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("p")
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("covered_tokens"))
    )
    per_doc = grams.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    per_doc_dup = dup_starts.groupBy("doc_id").agg(F.count("*").alias("n_dup_ngrams"))
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .join(per_doc_dup, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_dup_ngrams", F.lit(0)).cast("long").alias("n_dup_ngrams"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
            F.round(
                F.coalesce("covered_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_token_frac"),
        )
    )


def corpus_line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-level boilerplate LINE removal — the CCNet/C4-style cleanup
    TRANSFORM (not just a metric): drop every line that appears verbatim
    in >= min_docs distinct documents (nav bars, cookie banners, license
    headers), keeping the remaining lines in original order. This is the
    cross-document complement of repetition_profile's in-doc dup-line
    signal, and unlike the dedup operators it rewrites the text.

    → (doc_id, clean_text, n_lines, n_removed) for every input doc;
    n_lines counts the trimmed non-empty lines, clean_text joins the kept
    ones with '\\n' ('' when everything was boilerplate).

    Scale shape: lines are md5-hashed in the emitting projection (32-byte
    digests shuffle, not line text); the boilerplate set is a distinct on
    (hash, doc) + one map-side-combined count; the removal is a left_anti
    join on the hash (never broadcast — web-scale boilerplate vocabulary);
    reassembly sorts only WITHIN each doc's collected line array (row
    bounded by document length, no global sort).
    """
    t = F.col(text_col)
    lines = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(t, r"\n")).alias("pos", "_raw"),
        )
        .select("doc_id", "pos", F.trim(F.col("_raw")).alias("l"))
        .filter(F.col("l") != "")
        .withColumn("g", F.md5("l"))
    )
    boiler = (
        lines.select("g", "doc_id")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("g")
    )
    kept = lines.join(boiler, "g", "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "l"))), lambda s: s["l"]
            ),
            "\n",
        ).alias("clean_text"),
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(totals, "doc_id", "left")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )
