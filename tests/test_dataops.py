"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing — exact python/numpy oracles on small fixtures."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_project_spark.operators import dedup, multimodal, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


def norm_text(t: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", t.lower())).strip()


def py_shingles(t: str, n=3) -> set[str]:
    toks = norm_text(t).split(" ")
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


# --- exact dedup ------------------------------------------------------------

def test_exact_dedup_matches_python_oracle(spark, docs, docs_pdf):
    # the sf0.001 documents have no byte-exact dups → add three copies of
    # doc 0 (one differing only in case/punct, which normalization folds)
    extra = pd.DataFrame(
        {
            "doc_id": [9001, 9002, 9003],
            "text": [docs_pdf.text[0], docs_pdf.text[0].upper() + "!", docs_pdf.text[1]],
            "lang": ["xx"] * 3,
            "source": ["synth"] * 3,
            "n_chars": [1] * 3,
        }
    )
    all_docs = docs.unionByName(spark.createDataFrame(extra))
    all_pdf = pd.concat([docs_pdf, extra], ignore_index=True)
    got = {r["fp"]: (r["n_docs"], r["canonical_id"]) for r in dedup.exact_dedup_groups(all_docs).collect()}
    groups: dict[str, list[int]] = {}
    for _, row in all_pdf.iterrows():
        fp = hashlib.md5(norm_text(row["text"]).encode()).hexdigest()
        groups.setdefault(fp, []).append(row["doc_id"])
    exp = {fp: (len(ids), min(ids)) for fp, ids in groups.items() if len(ids) >= 2}
    assert got == exp
    assert len(exp) >= 2  # {0, 9001, 9002} and {1, 9003}


# --- n-gram Jaccard ---------------------------------------------------------

def brute_jaccard_pairs(docs_pdf, thr):
    sh = {r.doc_id: py_shingles(r.text) for r in docs_pdf.itertuples()}
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / len(sh[a] | sh[b])
            if round(j, 6) >= thr:
                out[(a, b)] = round(j, 6)
    return out


@pytest.fixture(scope="module")
def exact_pairs(docs_pdf):
    return brute_jaccard_pairs(docs_pdf, 0.5)


def test_ngram_jaccard_matches_bruteforce(spark, docs, exact_pairs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert set(got) == set(exact_pairs)
    for k in got:
        assert got[k] == pytest.approx(exact_pairs[k], abs=1e-6)


def test_minhash_lsh_pairs_subset_and_recall(spark, docs, exact_pairs):
    got = {(r["a"], r["b"]): r["jaccard"] for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    # precision: every returned pair is a true pair with the exact Jaccard
    for k, v in got.items():
        assert k in exact_pairs
        assert v == pytest.approx(exact_pairs[k], abs=1e-6)
    # recall: LSH banding (16 bands × 4 rows) at j≥0.5 → collision p ≥ 0.65;
    # fixture dups are near-identical so recall should be high
    if exact_pairs:
        assert len(got) / len(exact_pairs) >= 0.9


def test_minhash_signature_deterministic_and_dup_invariant(spark, docs):
    sig = dedup.minhash_signatures(docs, num_perm=16)
    s1 = {r["doc_id"]: tuple(r["sig"]) for r in sig.collect()}
    s2 = {r["doc_id"]: tuple(r["sig"]) for r in dedup.minhash_signatures(docs, num_perm=16).collect()}
    assert s1 == s2  # deterministic across runs
    assert all(len(v) == 16 for v in s1.values())


# --- SimHash ----------------------------------------------------------------

def test_simhash_identical_docs_collide(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["the quick brown fox jumps over the lazy dog"] * 2 + ["completely different words entirely here"],
        }
    )
    df = spark.createDataFrame(pdf)
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    pairs = {(r["a"], r["b"]): r["hamming"] for r in dedup.simhash_near_pairs(df, max_hamming=3).collect()}
    assert pairs == {(1, 2): 0}


# --- similarity search ------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def np_topk(ids, mat, k=5):
    nm = mat / np.linalg.norm(mat, axis=1)[:, None]
    sims = nm @ nm.T
    out = {}
    for i, qid in enumerate(ids):
        s = sims[i].copy()
        s[ids == qid] = -np.inf
        cand = np.argpartition(-s, k)[:k]
        order = np.lexsort((ids[cand], -s[cand]))
        out[qid] = [(int(ids[c]), round(float(s[c]), 6)) for c in cand[order]]
    return out


def test_brute_force_topk_exact(spark, emb, emb_np):
    ids, mat = emb_np
    exp = np_topk(ids, mat, k=5)
    got: dict[int, list] = {}
    for r in similarity.brute_force_topk(spark, emb, emb, k=5).collect():
        got.setdefault(r["vec_id"], []).append((r["neighbor"], r["cosine"]))
    assert set(got) == set(exp)
    for q in exp:
        assert [n for n, _ in got[q]] == [n for n, _ in exp[q]]
        for (gn, gc), (en, ec) in zip(got[q], exp[q]):
            assert gc == pytest.approx(ec, abs=2e-6)


def test_lsh_topk_recall_and_precision(spark, emb, emb_np):
    ids, mat = emb_np
    exp = np_topk(ids, mat, k=5)
    got: dict[int, list] = {}
    for r in similarity.lsh_topk(spark, emb, k=5).collect():
        got.setdefault(r["vec_id"], []).append((r["neighbor"], r["cosine"]))
    # cosine values of returned pairs are exact
    nm = mat / np.linalg.norm(mat, axis=1)[:, None]
    pos = {int(i): row for i, row in zip(ids, nm)}
    hits = total = 0
    for q, nbrs in got.items():
        for n, c in nbrs:
            assert c == pytest.approx(round(float(pos[q] @ pos[n]), 6), abs=2e-6)
        true_set = {n for n, _ in exp[q]}
        hits += len(true_set & {n for n, _ in nbrs})
        total += len(true_set)
    assert total > 0 and hits / total >= 0.5  # approximate path: bounded recall


# --- text stats -------------------------------------------------------------

def test_text_profile_oracle(spark):
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "The cat and the dog is in the house, and it is warm.",
                "el perro y el gato en la casa se fue",
                "zzz qqq",
            ],
        }
    )
    out = {r["doc_id"]: r.asDict() for r in textstats.text_profile(spark.createDataFrame(rows)).collect()}
    assert out[1]["n_tokens"] == 13
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "es"
    assert out[3]["lang_pred"] == "und"
    assert out[1]["fp"] == hashlib.md5(norm_text(rows.text[0]).encode()).hexdigest()
    # BPE-ish: letter runs + digit runs + single punct
    assert out[3]["n_bpe_tokens"] == 2
    assert 0.0 <= out[1]["quality"] <= 1.0


def test_tfidf_topk_matches_python_oracle(spark):
    import math
    import re
    from collections import Counter

    texts = {
        1: "apple banana apple cherry",
        2: "banana cherry cherry dog",
        3: "dog egg egg egg apple",
        4: "   ",  # tokenless doc: no output rows, but counts toward N
    }
    rows = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = textstats.tfidf_topk(spark.createDataFrame(rows), k=2).collect()

    tok = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in texts.items()}
    tfs = {d: Counter(ts) for d, ts in tok.items()}
    dfs = Counter(term for c in tfs.values() for term in c)
    n = float(len(texts))
    exp = {}
    for d, c in tfs.items():
        scored = sorted(
            ((round(tf * math.log(n / dfs[t]), 6), t) for t, tf in c.items()),
            key=lambda p: (-p[0], p[1]),
        )
        for i, (s, t) in enumerate(scored[:2], start=1):
            exp[(d, t)] = (s, i)
    got = {(r["doc_id"], r["term"]): (r["tfidf"], r["rnk"]) for r in out}
    assert got == exp
    assert not any(d == 4 for d, _ in got)  # empty doc emits nothing


def test_fingerprint_whitespace_invariant(spark):
    a = spark.range(1).select(textstats.fingerprint(F.lit("Hello,  World!")).alias("f")).first()["f"]
    b = spark.range(1).select(textstats.fingerprint(F.lit("hello world")).alias("f")).first()["f"]
    assert a == b


# --- multimodal -------------------------------------------------------------

def test_image_features_deterministic_and_schema(spark):
    media = multimodal.synthesize_media(spark, n=12)
    out = multimodal.image_features(media).collect()
    assert len(out) == len([r for r in media.collect() if r["kind"] == "image"])
    again = {r["media_id"]: (r["mean_px"], r["p_hash"]) for r in multimodal.image_features(media).collect()}
    for r in out:
        assert again[r["media_id"]] == (r["mean_px"], r["p_hash"])
        assert 0 <= r["mean_px"] <= 255
        assert len(r["p_hash"]) == 32


def test_frame_sample_counts(spark):
    media = multimodal.synthesize_media(spark, n=12)
    vids = {r["media_id"]: r["meta"]["n_frames"] for r in media.collect() if r["kind"] == "video"}
    out = multimodal.frame_sample(media, every_n=10).collect()
    per = {}
    for r in out:
        per[r["media_id"]] = per.get(r["media_id"], 0) + 1
    exp = {mid: len(range(0, nf, 10)) for mid, nf in vids.items() if nf > 0}
    assert per == exp


def test_real_decoder_is_gated(spark):
    with pytest.raises(NotImplementedError):
        multimodal._real_decode_image(b"\x00")


def test_ivf_topk_recall_and_precision(spark, emb, emb_np):
    ids, mat = emb_np
    exp = np_topk(ids, mat, k=5)
    got: dict[int, list] = {}
    for r in similarity.ivf_topk(spark, emb, k=5, n_centroids=8, nprobe=3).collect():
        got.setdefault(r["vec_id"], []).append((r["neighbor"], r["cosine"]))
    nm = mat / np.linalg.norm(mat, axis=1)[:, None]
    pos = {int(i): row for i, row in zip(ids, nm)}
    hits = total = 0
    for q, nbrs in got.items():
        for n, c in nbrs:  # precision: cosines of returned pairs are exact
            assert c == pytest.approx(round(float(pos[q] @ pos[n]), 6), abs=2e-6)
        true_set = {n for n, _ in exp[q]}
        hits += len(true_set & {n for n, _ in nbrs})
        total += len(true_set)
    assert total > 0 and hits / total >= 0.5  # approximate path: bounded recall
    # determinism across runs (seeded centroids, deterministic sample)
    again: dict[int, list] = {}
    for r in similarity.ivf_topk(spark, emb, k=5, n_centroids=8, nprobe=3).collect():
        again.setdefault(r["vec_id"], []).append((r["neighbor"], r["cosine"]))
    assert got == again


def test_audio_features_match_numpy(spark):
    import numpy as np

    media = multimodal.synthesize_media(spark, n=12)
    rows = {r["media_id"]: r for r in media.collect() if r["kind"] == "audio"}
    out = {r["media_id"]: r for r in multimodal.audio_features(media).collect()}
    assert set(out) == set(rows)
    for mid, r in rows.items():
        data = bytes(r["data"])
        pcm = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2").astype(np.float64)
        x = pcm / 32768.0
        assert out[mid]["rms"] == pytest.approx(float(np.sqrt((x * x).mean())), abs=1e-12)
        assert out[mid]["duration_sec"] == pytest.approx(len(x) / r["meta"]["sample_rate"], abs=1e-12)
        assert out[mid]["zero_cross_rate"] == pytest.approx(
            float((np.diff(np.signbit(x)) != 0).mean()), abs=1e-12
        )


def test_image_resize_composes_with_features(spark):
    import numpy as np

    media = multimodal.synthesize_media(spark, n=12)
    small = multimodal.image_resize(media, out_h=8, out_w=8)
    rows = small.collect()
    assert len(rows) == len([r for r in media.collect() if r["kind"] == "image"])
    for r in rows:
        assert r["meta"]["height"] == 8 and r["meta"]["width"] == 8
        assert len(bytes(r["data"])) == 8 * 8 * r["meta"]["channels"]
    # resized table is a valid media table: features over it must run and
    # equal features computed on driver-side nearest-neighbor thumbnails
    feats = {r["media_id"]: r["mean_px"] for r in multimodal.image_features(small).collect()}
    for r in (x for x in media.collect() if x["kind"] == "image"):
        h, w, c = r["meta"]["height"], r["meta"]["width"], r["meta"]["channels"]
        px = multimodal._fake_decode_image(bytes(r["data"]), r["meta"])
        ys = np.linspace(0, h - 1, 8).astype(int)
        xs = np.linspace(0, w - 1, 8).astype(int)
        exp = px[ys[:, None], xs[None, :], :].astype(np.float64).mean()
        assert feats[r["media_id"]] == pytest.approx(float(exp), abs=1e-9)


def test_ngram_contamination_matches_python_oracle(spark):
    from pagerank_project_spark.operators.dedup import ngram_contamination

    _norm = norm_text  # module-level helper

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick brown fox appeared",          # shares "quick brown fox" with 1
        3: "entirely different words here now",
        10: "the quick brown fox jumps again",    # benchmark doc
        20: "different words here",               # benchmark doc, <3 tokens after dedup? no: 3 tokens -> 1 shingle
    }
    rows = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    docs = spark.createDataFrame(rows)
    bench = docs.filter(F.col("doc_id").isin(10, 20))
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in ngram_contamination(docs, bench, n=3).collect()
    }

    def sh3(t):
        tk = _norm(t).split(" ")
        return set(
            " ".join(tk[i:i + 3]) for i in range(len(tk) - 2)
        ) if len(tk) >= 3 else {" ".join(tk)}

    exp = {}
    for b in (10, 20):
        for d, t in texts.items():
            if d == b:
                continue
            shared = len(sh3(t) & sh3(texts[b]))
            if shared:
                exp[(d, b)] = shared
    assert got == exp
    assert (1, 10) in got and got[(1, 10)] >= 2  # real overlap is detected


def test_quality_filter_per_lang_keeps_top_fraction(spark, docs, docs_pdf):
    from math import ceil

    from pagerank_project_spark.operators.textstats import quality_filter_per_lang

    out = quality_filter_per_lang(docs, keep_frac=0.5).collect()
    prof = {
        r["doc_id"]: (r["lang_pred"], r["quality"])
        for r in textstats.text_profile(docs).collect()
    }
    by_lang: dict[str, list] = {}
    for d, (lang, q) in prof.items():
        by_lang.setdefault(lang, []).append((-q, d))
    exp = set()
    for lang, rows in by_lang.items():
        rows.sort()
        exp |= {d for _, d in rows[: ceil(0.5 * len(rows))]}
    got = {r["doc_id"] for r in out}
    assert got == exp
    for r in out:  # rank/cardinality bookkeeping is consistent
        assert 1 <= r["rn"] <= ceil(0.5 * r["n_lang"])
        assert r["n_lang"] == len(by_lang[r["lang_pred"]])
    with pytest.raises(ValueError):
        quality_filter_per_lang(docs, keep_frac=0.0)


def test_bigram_lm_matches_python_oracle(spark):
    from collections import Counter

    from pagerank_project_spark.operators.textstats import bigram_lm_stats

    texts = ["the cat sat on the mat", "the cat ran", "x", ""]
    rows = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = {(r["w1"], r["w2"]): (r["c"], r["p"]) for r in bigram_lm_stats(spark.createDataFrame(rows)).collect()}

    c = Counter()
    for t in texts:
        tk = norm_text(t).split(" ") if norm_text(t) else []
        c.update(zip(tk, tk[1:]))
    ctx = Counter()
    for (w1, _), n in c.items():
        ctx[w1] += n
    exp = {k: (n, round(n / ctx[k[0]], 6)) for k, n in c.items()}
    assert got == exp
    assert got[("the", "cat")] == (2, round(2 / 3, 6))  # ctx('the') = {cat×2, mat×1}
