"""Text analysis expressions: token counts, ratios, lang-id, fingerprint."""

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count,
    text_profile,
)


def one(spark, text, expr, name="v"):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias(name)).first()[0]


def test_token_count(spark):
    assert one(spark, "a b  c   d", token_count(F.col("text"))) == 4
    assert one(spark, "   ", token_count(F.col("text"))) == 0
    assert one(spark, "single", token_count(F.col("text"))) == 1


def test_bpe_ish_token_count(spark):
    # words + punctuation pieces
    assert one(spark, "hello, world!", bpe_ish_token_count(F.col("text"))) == 4


def test_stopword_ratio(spark):
    assert one(spark, "the cat and the dog", stopword_ratio(F.col("text"))) == 0.6


def test_lang_id_markers(spark):
    assert one(spark, "der hund und die katze ist da", lang_id(F.col("text"))) == "de"
    assert one(spark, "the cat is here and there with us", lang_id(F.col("text"))) == "en"
    assert one(spark, "le chat et la maison est grande", lang_id(F.col("text"))) == "fr"
    assert one(spark, "xyzzy plugh qwerty", lang_id(F.col("text"))) == "und"


def test_fingerprint_matches_python(spark):
    text = "spark engine"
    expected = 0
    for ch in text:
        expected = (expected * 31 + ord(ch)) % 1_000_000_007
    assert one(spark, text, fingerprint(F.col("text"))) == expected


def test_quality_score_bounds(spark):
    good = one(spark, "the engine processes data and the results are stored in the table " * 3, quality_score(F.col("text")))
    bad = one(spark, "!!! ??? ;;; ::: @@@", quality_score(F.col("text")))
    assert 0.0 <= bad < good <= 1.0


def test_text_profile_columns(spark):
    df = spark.createDataFrame([(1, "the quick brown fox")], "doc_id long, text string")
    row = text_profile(df).first()
    for col in ("n_tokens", "stopword_ratio", "punct_ratio", "quality", "pred_lang", "fingerprint"):
        assert col in row.asDict()


def test_winnow_matches_python_reference_and_guarantee(spark):
    """Differential: Spark winnowing must equal a direct python
    implementation (same md5-60, leftmost-min tie-break); plus the
    winnowing GUARANTEE: two docs sharing a run of window+k-1 tokens
    share at least one selected fingerprint."""
    import hashlib
    import random

    from graphdb_for_drones_spark.operators.text import winnow_fingerprints

    k, w = 3, 4
    rng = random.Random(123)
    vocab = [f"w{i}" for i in range(30)]
    shared = ["s1", "s2", "s3", "s4", "s5", "s6"]  # w + k - 1 = 6 tokens
    texts = []
    for i in range(25):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        if i in (3, 17):  # plant the shared run in two docs
            at = rng.randint(0, len(words))
            words = words[:at] + shared + words[at:]
        texts.append((i, " ".join(words)))
    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in texts],
        "doc_id long, text string, lang string, source string",
    ).localCheckpoint()

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def ref(words):
        if not words:
            grams = [md5_60("")]
        elif len(words) < k:
            grams = [md5_60(" ".join(words))]
        else:
            grams = [
                md5_60(" ".join(words[i : i + k]))
                for i in range(len(words) - k + 1)
            ]
        sel = set()
        for j in range(max(len(grams) - w, 0) + 1):
            win = grams[j : j + w]
            m = min(win)
            sel.add((m, j + win.index(m) + 1))
        return grams, sel

    refs = {i: ref(t.lower().strip().split()) for i, t in texts}
    got = {
        r.doc_id: r
        for r in winnow_fingerprints(docs, k=k, window=w).collect()
    }
    for i, (grams, sel) in refs.items():
        assert got[i].n_grams == len(grams), i
        assert got[i].n_selected == len(sel), i
        assert got[i].min_fp == min(fp for fp, _ in sel), i
    # the guarantee: docs 3 and 17 share a selected fingerprint value
    fps3 = {fp for fp, _ in refs[3][1]}
    fps17 = {fp for fp, _ in refs[17][1]}
    shared_grams = {
        md5_60(" ".join(shared[i : i + k])) for i in range(len(shared) - k + 1)
    }
    assert fps3 & fps17 & shared_grams


def test_bpe_merge_pairs_matches_python_reference(spark):
    from collections import Counter

    from graphdb_for_drones_spark.operators.text import bpe_merge_pairs

    texts = [
        (0, "the cat sat on the mat"),
        (1, "  Banana   bandana  "),
        (2, "a b c"),          # 1-char words contribute nothing
        (3, ""),               # empty doc
        (4, "zzzz zz"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in texts],
        "doc_id long, text string, lang string, source string",
    )
    ref = Counter()
    for _, t in texts:
        for w in t.lower().strip().split():
            for i in range(len(w) - 1):
                ref[w[i : i + 2]] += 1
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.pair, r.pair_count)
        for r in bpe_merge_pairs(docs, k=10).collect()
    ]
    assert got == want
    # top merge on this corpus is a real pair, counted across words
    assert ref[got[0][0]] == got[0][1]


def test_vocab_stats_matches_python_reference(spark):
    from collections import Counter

    from graphdb_for_drones_spark.operators.text import vocab_stats

    texts = [
        (0, "sA", "the cat sat on the mat"),
        (1, "sA", "the dog"),
        (2, "sB", "one two two three three three"),
        (3, "sB", ""),  # contributes no tokens
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", s) for i, s, t in texts],
        "doc_id long, text string, lang string, source string",
    )
    per = {}
    for _, s, t in texts:
        per.setdefault(s, Counter()).update(t.lower().strip().split())
    got = {r.source: r for r in vocab_stats(docs).collect()}
    assert set(got) == set(per)
    for s, c in per.items():
        n_tok = sum(c.values())
        assert got[s].n_tokens == n_tok, s
        assert got[s].n_types == len(c), s
        assert got[s].n_hapax == sum(1 for v in c.values() if v == 1), s
        assert got[s].type_token_ratio == len(c) * 1.0 / n_tok, s


def test_hashed_logit_scores_exact_and_edge_safe(spark):
    import hashlib

    from graphdb_for_drones_spark.operators.text import hashed_logit_scores

    def py_w10(tok, n_buckets=64, seed=7):
        h = int(hashlib.md5(f"{tok}:q{seed}".encode()).hexdigest()[:15], 16)
        return ((h % n_buckets) * 37 + 11) % 21 - 10

    texts = [
        (0, "the cat  SAT on the mat"),  # mixed case + double space
        (1, "singleton"),
        (2, ""),  # empty: n=0, logit 0, score NULL, keep False
        (3, "   "),  # whitespace-only behaves as empty
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r for r in hashed_logit_scores(docs).collect()}

    for doc_id, text in texts:
        toks = text.lower().strip().split()
        z10 = sum(py_w10(t) for t in toks)
        r = got[doc_id]
        assert r.n_tokens == len(toks), doc_id
        assert r.logit10 == z10, doc_id
        assert r.keep == (z10 > 0), doc_id
        if toks:
            assert r.score == round(z10 / (10.0 * len(toks)), 9)
        else:
            assert r.score is None

    # carry_cols passthrough keeps the plan single-scan (no join back)
    docs2 = spark.createDataFrame(
        [(0, "a b c", "sX")], "doc_id long, text string, source string"
    )
    out = hashed_logit_scores(docs2, carry_cols=("source",))
    assert out.columns == [
        "doc_id",
        "source",
        "n_tokens",
        "logit10",
        "score",
        "keep",
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_bpe_train_matches_pure_python_trainer(spark):
    from collections import Counter

    from graphdb_for_drones_spark.operators.text import bpe_train

    texts = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new"),
        (2, "wider wide wide widest"),
        (3, "a"),  # single char: no pairs
        (4, ""),
    ]

    def py_train(corpus, n_merges):
        words = []
        for _, t in corpus:
            words += [w for w in t.lower().strip().split() if len(w) >= 2]
        merges = []
        for r in range(1, n_merges + 1):
            counts = Counter()
            for w in words:
                for i in range(len(w) - 1):
                    counts[w[i : i + 2]] += 1
            if not counts:
                break
            # (count DESC, pair ASC) — the engine/oracle total order
            pair, count = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((r, pair, count))
            sym = chr(0xE000 + r - 1)
            words = [w.replace(pair, sym) for w in words]
        return merges

    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = [
        (r.rank, r.pair, r.pair_count)
        for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()
    ]
    want = py_train(texts, 6)
    assert got == want
    # multi-round re-segmentation must surface at least one merge whose
    # pair contains an earlier-minted symbol (e.g. 'e'+<st> from
    # 'lowest/newest/widest') — otherwise the loop isn't iterating
    assert any(ord(c) >= 0xE000 for _, p, _ in got[1:] for c in p)

    # pairless corpus: no merges, stable empty schema
    tiny = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    out = bpe_train(tiny, n_merges=3)
    assert out.columns == ["rank", "pair", "pair_count"]
    assert out.count() == 0


def test_bpe_driver_path_matches_distributed(spark, monkeypatch):
    """The r12 driver-sized training shortcut must be bit-identical to
    the distributed merge loop: force the distributed path by zeroing
    the vocab threshold and compare the full merge lists."""
    from graphdb_for_drones_spark.operators import text as T

    texts = [
        (0, "low lower lowest low low"),
        (1, "new newer newest new"),
        (2, "wider wide wide widest"),
        (3, "abab ababab ab"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    driver = T.bpe_train_list(docs, n_merges=6)
    monkeypatch.setattr(T, "BPE_DRIVER_VOCAB_THRESHOLD", 0)
    distributed = T.bpe_train_list(docs, n_merges=6)
    assert driver == distributed
    assert driver, "trainer found no merges on a repetitive corpus"


def test_bpe_segment_stats_matches_python_segmentation(spark):
    from graphdb_for_drones_spark.operators.text import (
        bpe_segment_stats,
        bpe_train_list,
    )

    texts = [
        (0, "low lower lowest low low", "sA"),
        (1, "new newer newest new", "sA"),
        (2, "wider wide wide widest", "sB"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string, source string")
    merges = bpe_train_list(docs, n_merges=5)
    assert merges, "trainer found no merges on a repetitive corpus"

    def segment(word):
        for r, pair, _ in merges:
            word = word.replace(pair, chr(0xE000 + r - 1))
        return word

    per = {}
    for _, t, s in texts:
        for w in t.lower().strip().split():
            if len(w) < 2:
                continue
            d = per.setdefault(s, [0, 0, 0])
            d[0] += 1
            d[1] += len(w)
            d[2] += len(segment(w))

    got = {r.source: r for r in bpe_segment_stats(docs, merges).collect()}
    assert set(got) == set(per)
    for s, (nw, nc, ns) in per.items():
        r = got[s]
        assert (r.n_words, r.n_chars, r.n_symbols) == (nw, nc, ns), s
        assert r.compression == round(ns / nc, 9), s
        assert r.n_symbols < r.n_chars, "merges should compress this corpus"


def test_doc_frequency_topk_counts_docs_not_tokens(spark):
    from graphdb_for_drones_spark.operators.text import doc_frequency_topk

    texts = [
        (0, "the the the cat"),  # 'the' repeats in-doc: df must still be 1
        (1, "the dog"),
        (2, "cat and dog"),
        (3, ""),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.word: (r.df, r.df_frac) for r in doc_frequency_topk(docs, k=10).collect()}
    assert got["the"] == (2, round(2 / 4, 9))  # frac over ALL docs incl. empty
    assert got["cat"] == (2, 0.5)
    assert got["dog"] == (2, 0.5)
    assert got["and"] == (1, 0.25)
    # tie-break: (df DESC, word ASC) — deterministic k cut
    top2 = [r.word for r in doc_frequency_topk(docs, k=2).collect()]
    assert top2 == ["cat", "dog"]
