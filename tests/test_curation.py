"""Unit semantics for operators/curation.py (the catalog queries are
oracle-checked in tests/test_queries_oracle.py; these pin the operator
contracts on controlled inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators import curation


def _docs(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    return df.localCheckpoint()


def test_contamination_finds_planted_overlap(spark):
    train = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "train"),
            (2, "one two three four five six seven", "en", "train"),
        ],
    )
    ev = _docs(
        spark,
        [
            (100, "alpha beta gamma delta epsilon eta", "en", "eval"),
            (101, "unrelated words entirely different here", "en", "eval"),
        ],
    )
    out = curation.contamination_pairs(train, ev, threshold=0.3).collect()
    assert len(out) == 1
    row = out[0]
    # shingle sets: train doc 1 has 4 trigrams, eval 100 has 4, 3 shared
    assert (row.train_id, row.eval_id) == (1, 100)
    assert row.jaccard == pytest.approx(3 / 5)


def test_contamination_is_directional_no_self_pairs(spark):
    docs = _docs(spark, [(1, "a b c d e", "en", "s")])
    out = curation.contamination_pairs(docs, docs, threshold=0.1).collect()
    # same doc on both sides: legitimate (train_id=eval_id) full overlap
    assert len(out) == 1 and out[0].jaccard == 1.0


def test_contamination_max_df_drops_boilerplate(spark):
    # boilerplate trigram in every train doc; with max_df=1 it cannot
    # generate candidates
    train = _docs(
        spark,
        [
            (1, "tmpl a b c same same same", "en", "t"),
            (2, "tmpl a b c other other other", "en", "t"),
        ],
    )
    ev = _docs(spark, [(9, "tmpl a b c nothing else here", "en", "e")])
    with_df = curation.contamination_pairs(train, ev, threshold=0.01)
    without = curation.contamination_pairs(train, ev, threshold=0.01, max_df=1)
    assert with_df.count() > 0
    assert without.count() == 0


def test_pack_sequences_offset_binning(spark):
    # 5 docs x 200 tokens, budget 512: first-token offsets 0,200,400,600,
    # 800 -> packs 0,0,0,1,1
    rows = [(i, " ".join(f"w{j}" for j in range(200)), "en", "s") for i in range(5)]
    out = (
        curation.pack_sequences(_docs(spark, rows), budget=512)
        .orderBy("doc_id")
        .collect()
    )
    assert [r.pack_id for r in out] == [0, 0, 0, 1, 1]
    assert all(r.n_tokens == 200 for r in out)
    assert all(r.shard == 0 for r in out)


def test_pack_sequences_sharding_bounds_windows(spark):
    rows = [(i, "a b c", "en", "s") for i in (0, 999, 1000, 2500)]
    out = curation.pack_sequences(
        _docs(spark, rows), budget=4, shard_size=1000
    ).collect()
    shards = {r.doc_id: r.shard for r in out}
    assert shards == {0: 0, 999: 0, 1000: 1, 2500: 2}
    # cumsum restarts per shard: doc 1000 starts pack 0 of shard 1
    packs = {r.doc_id: r.pack_id for r in out}
    assert packs[1000] == 0


def test_mixture_weights_uniform_target(spark):
    rows = [
        (1, "a b c d", "en", "big"),  # 4 tokens
        (2, "a b c d", "en", "big"),  # 4 tokens
        (3, "a b", "en", "small"),  # 2 tokens
    ]
    out = {r.source: r for r in curation.mixture_weights(_docs(spark, rows)).collect()}
    assert out["big"].token_share == pytest.approx(0.8)
    assert out["small"].token_share == pytest.approx(0.2)
    # uniform target 0.5 each: big undersampled, small oversampled
    assert out["big"].weight == pytest.approx(0.5 / 0.8)
    assert out["small"].weight == pytest.approx(0.5 / 0.2)


def test_mixture_weights_explicit_target(spark):
    rows = [(1, "a b", "en", "x"), (2, "a b", "en", "y")]
    out = {
        r.source: r
        for r in curation.mixture_weights(
            _docs(spark, rows), target={"x": 0.9, "y": 0.1}
        ).collect()
    }
    assert out["x"].weight == pytest.approx(0.9 / 0.5)
    assert out["y"].weight == pytest.approx(0.1 / 0.5)


def test_temperature_mixture_flattens_head(spark):
    # 16 vs 4 tokens: alpha=1 keeps the 4:1 ratio, alpha=0.5 flattens
    # it to sqrt(16):sqrt(4) = 2:1, alpha=0.25 to 2:sqrt(2)
    rows = [
        (1, " ".join(["w"] * 16), "en", "s"),
        (2, " ".join(["w"] * 4), "de", "s"),
    ]
    for alpha, ratio in [(1.0, 4.0), (0.5, 2.0), (0.25, 2.0**0.5)]:
        out = {
            r.lang: r
            for r in curation.temperature_mixture(
                _docs(spark, rows), domain_col="lang", alpha=alpha
            ).collect()
        }
        assert out["en"].weight / out["de"].weight == pytest.approx(ratio)
        assert out["en"].weight + out["de"].weight == pytest.approx(1.0)
        assert out["en"].n_tokens == 16 and out["de"].n_tokens == 4
        assert (
            out["en"].planned_docs
            == int(out["en"].weight * 10_000) // 1
        )


def test_temperature_mixture_rejects_inexact_alpha(spark):
    df = _docs(spark, [(1, "a", "en", "s")])
    with pytest.raises(ValueError, match="alpha=0.3"):
        curation.temperature_mixture(df, alpha=0.3)


def test_temperature_mixture_null_text_domain(spark):
    # one domain whose texts are all NULL must not poison the folded
    # denominator (NULL SUM -> NULL fold -> every weight 0.0)
    df = _docs(spark, [(1, None, "xx", "s"), (2, "a b c d", "en", "s")])
    out = {
        r.lang: r
        for r in curation.temperature_mixture(df, domain_col="lang").collect()
    }
    assert out["xx"].n_tokens == 0 and out["xx"].weight == 0.0
    assert out["en"].weight == pytest.approx(1.0)


def test_temperature_mixture_all_empty_corpus(spark):
    # denominator 0: weights are 0.0, not a divide-by-zero job failure
    df = _docs(spark, [(1, "", "en", "s"), (2, "", "de", "s")])
    out = curation.temperature_mixture(df, domain_col="lang").collect()
    assert {r.weight for r in out} == {0.0}
    assert {r.planned_docs for r in out} == {0}


def test_repetition_scores(spark):
    rows = [
        (1, "a b a b a b", "en", "s"),  # bigrams: ab ba ab ba ab -> 2/5 distinct
        (2, "a b c d e", "en", "s"),  # all distinct
        (3, "solo", "en", "s"),  # single word -> one 1-gram shingle
    ]
    out = {r.doc_id: r for r in curation.repetition_scores(_docs(spark, rows)).collect()}
    assert out[1].rep_ratio == pytest.approx(1 - 2 / 5)
    assert out[2].rep_ratio == 0.0
    assert out[3].rep_ratio == 0.0


def test_repetition_no_python_udfs(spark):
    rows = [(1, "a b c", "en", "s")]
    plan = curation.repetition_scores(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ffd_packing_invariants(spark):
    # 7 docs with sizes that force first-fit-decreasing behaviour
    sizes = {1: 300, 2: 300, 3: 200, 4: 200, 5: 100, 6: 600, 7: 12}
    rows = [
        (i, " ".join(f"w{j}" for j in range(n)), "en", "s")
        for i, n in sizes.items()
    ]
    out = curation.pack_sequences_greedy(_docs(spark, rows), budget=512).collect()
    assert {r.doc_id for r in out} == set(sizes)
    by_pack = {}
    for r in out:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pack, members in by_pack.items():
        total = sum(r.n_tokens for r in members)
        # a pack only exceeds the budget when it holds a single oversized doc
        assert total <= 512 or (
            len(members) == 1 and members[0].n_tokens > 512
        ), (pack, members)
    # FFD on these sizes: [600] alone, [300+200(+12)], [300+200+100]-ish —
    # never more packs than the naive one-doc-per-pack bound, and at least
    # the LP lower bound ceil(total/budget)
    total = sum(sizes.values())
    assert (total + 511) // 512 <= len(by_pack) <= len(sizes)
    # oversized doc isolated
    pack_of_6 = next(r.pack_id for r in out if r.doc_id == 6)
    assert [r.doc_id for r in out if r.pack_id == pack_of_6] == [6]


def test_ffd_deterministic_and_sharded(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(50 + (i % 7) * 30)), "en", "s")
        for i in range(40)
    ] + [
        (1005, " ".join(f"w{j}" for j in range(100)), "en", "s")
    ]
    df = _docs(spark, rows)
    a = sorted(
        (r.doc_id, r.shard, r.pack_id)
        for r in curation.pack_sequences_greedy(df, budget=512).collect()
    )
    b = sorted(
        (r.doc_id, r.shard, r.pack_id)
        for r in curation.pack_sequences_greedy(df, budget=512).collect()
    )
    assert a == b
    shards = {d: s for d, s, _ in a}
    assert shards[1005] == 1 and shards[39] == 0


def test_deterministic_sample_is_stable_and_prob_monotone(spark):
    rows = [(i, " ".join("w" for _ in range(i % 120 + 1)), "en", "s") for i in range(400)]
    df = _docs(spark, rows)
    p_half = curation.deterministic_sample(df, F.lit(0.5))
    a = sorted(r.doc_id for r in p_half.collect())
    b = sorted(r.doc_id for r in p_half.collect())
    assert a == b  # rerun-stable
    n_all = curation.deterministic_sample(df, F.lit(1.0)).count()
    n_none = curation.deterministic_sample(df, F.lit(0.0)).count()
    assert n_all == 400 and n_none == 0
    # keep rate tracks probability (md5 uniform: loose 3-sigma bounds)
    assert 140 <= len(a) <= 260
    # monotone: the p=0.25 keep set is a subset of the p=0.5 keep set
    quarter = {r.doc_id for r in curation.deterministic_sample(df, F.lit(0.25)).collect()}
    assert quarter <= set(a)


def test_containment_catches_quoted_prompt(spark):
    # a short eval prompt quoted verbatim inside a long train doc: low
    # jaccard, containment 1.0 — the case the asymmetric metric exists for
    filler = " ".join(f"f{i}" for i in range(60))
    train = _docs(spark, [(1, filler + " the secret eval prompt here", "en", "t")])
    ev = _docs(spark, [(9, "the secret eval prompt here", "en", "e")])
    cont = curation.contamination_pairs(train, ev, threshold=0.9, metric="containment").collect()
    assert len(cont) == 1 and cont[0].containment == 1.0
    jac = curation.contamination_pairs(train, ev, threshold=0.2, metric="jaccard").collect()
    assert jac == []  # jaccard misses it at any reasonable threshold


def test_contamination_unknown_metric_raises(spark):
    docs = _docs(spark, [(1, "a b c d e", "en", "s")])
    with pytest.raises(ValueError, match="unknown metric"):
        curation.contamination_pairs(docs, docs, metric="dice").collect()


def test_mixture_weights_missing_domain_gets_zero_weight(spark):
    # domain absent from an explicit target: weight 0.0 ("sample none"),
    # never a silent NULL that drops the domain downstream
    rows = [(1, "a b", "en", "x"), (2, "a b", "en", "y"), (3, "a b", "en", "z")]
    out = {
        r.source: r
        for r in curation.mixture_weights(
            _docs(spark, rows), target={"x": 0.5, "y": 0.5}
        ).collect()
    }
    assert set(out) == {"x", "y", "z"}
    assert out["z"].weight == 0.0 and out["z"].weight is not None


def test_mixture_weights_target_validated_and_normalized(spark):
    rows = [(1, "a b", "en", "x"), (2, "a b", "en", "y")]
    df = _docs(spark, rows)
    with pytest.raises(ValueError, match="negative"):
        curation.mixture_weights(df, target={"x": -0.1, "y": 1.1})
    with pytest.raises(ValueError, match="sum"):
        curation.mixture_weights(df, target={"x": 0.0})
    # un-normalized shares are scaled to 1: {9, 1} == {0.9, 0.1}
    out = {
        r.source: r
        for r in curation.mixture_weights(df, target={"x": 9, "y": 1}).collect()
    }
    assert out["x"].weight == pytest.approx(0.9 / 0.5)
    assert out["y"].weight == pytest.approx(0.1 / 0.5)


def test_ffd_packing_string_doc_ids(spark):
    # a non-long id column must flow through applyInPandas unchanged
    # (output dtype is derived, not hardcoded long)
    df = spark.createDataFrame(
        [("d-1", "a b c", "en"), ("d-2", "a b c d e", "en")],
        "name string, text string, lang string",
    ).localCheckpoint()
    with pytest.raises(TypeError, match="num_shards"):
        curation.pack_sequences_greedy(df, id_col="name", budget=8)
    out = curation.pack_sequences_greedy(
        df, id_col="name", budget=8, num_shards=4
    )
    assert dict(out.dtypes)["doc_id"] == "string"
    rows = sorted((r.doc_id, r.n_tokens) for r in out.collect())
    assert rows == [("d-1", 3), ("d-2", 5)]


def test_duplicated_span_scores(spark):
    # docs 1 and 2 share their full text (every 5-gram duplicated);
    # doc 3 is unique (no cross-doc 5-gram)
    shared = "alpha beta gamma delta epsilon zeta eta"
    df = _docs(
        spark,
        [
            (1, shared, "en", "x"),
            (2, shared, "en", "x"),
            (3, "one two three four five six seven eight", "en", "y"),
        ],
    )
    out = {r.doc_id: r for r in curation.duplicated_span_scores(df).collect()}
    assert out[1].n_shingles == 3 and out[1].n_dup_shingles == 3
    assert out[1].dup_ratio == 1.0
    assert out[3].n_dup_shingles == 0 and out[3].dup_ratio == 0.0


def test_duplicated_span_short_doc_whole_text_shingle(spark):
    # < n words -> one whole-text shingle; two identical short docs are
    # fully duplicated spans of each other
    df = _docs(spark, [(1, "tiny doc", "en", "x"), (2, "tiny doc", "en", "x")])
    out = {r.doc_id: r for r in curation.duplicated_span_scores(df).collect()}
    assert out[1].n_shingles == 1 and out[1].dup_ratio == 1.0


def test_gopher_rule_flags(spark):
    long_ok = " ".join(["the"] * 25 + ["word"] * 30)  # 55 words, stopwordy
    short = "too short entirely"  # fails word count
    thin_sw = " ".join(f"w{i}" for i in range(60))  # no stopwords
    repeated = " ".join(["dup dup"] * 40)  # bigram soup
    df = _docs(
        spark,
        [
            (1, long_ok, "en", "a"),
            (2, short, "en", "a"),
            (3, thin_sw, "en", "a"),
            (4, repeated, "en", "a"),
        ],
    )
    out = {r.doc_id: r for r in curation.gopher_rule_flags(df).collect()}
    assert out[1].pass_word_count and out[1].pass_stopword
    assert not out[2].pass_word_count
    assert not out[3].pass_stopword
    assert not out[4].pass_repetition
    stats = curation.gopher_rule_stats(df, group_col="source").collect()[0]
    assert stats.n_docs == 4
    assert stats.n_pass_word_count == 3  # docs 1, 3, 4
    assert stats.n_pass_all <= min(
        stats.n_pass_word_count, stats.n_pass_stopword
    )


def test_tfidf_top_terms_ranks_rare_terms(spark):
    df = _docs(
        spark,
        [
            (1, "common common rare rare", "en", "x"),
            (2, "common other other words", "en", "x"),
            (3, "common words words here", "en", "x"),
        ],
    )
    out = curation.tfidf_top_terms(df, k=1).collect()
    top = {r.doc_id: r for r in out}
    # 'rare' in doc 1 only: tf 2 · idf 3/1 = 6 beats 'common' (2 · 3/3 = 2)
    assert top[1].term == "rare" and top[1].df == 1
    assert top[1].tfidf == pytest.approx(6.0)
    # doc 2: 'other' tf=2 df=1 -> 6.0 beats 'common'/'words'
    assert top[2].term == "other"


def test_semantic_dedup_stats_min_id_keeper(spark):
    from graphdb_for_drones_spark.operators.similarity import (
        semantic_dedup_stats,
    )

    # cluster 0: ids 1,2 identical (dup -> 2 dropped), id 3 orthogonal;
    # cluster 1: ids 4,5 near-identical above threshold
    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
        (4, [0.0, 0.0, 1.0], 1),
        (5, [0.0, 0.01, 1.0], 1),
    ]
    idx = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    ).localCheckpoint()
    out = {
        r.cluster: r
        for r in semantic_dedup_stats(idx, threshold=0.95, dim=3).collect()
    }
    assert out[0].n_vectors == 3 and out[0].n_dups == 1 and out[0].n_kept == 2
    assert out[1].n_vectors == 2 and out[1].n_dups == 1 and out[1].n_kept == 1


def test_semantic_dedup_apply_matches_stats(spark):
    from graphdb_for_drones_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_stats,
    )

    rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [1.0, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 0),
        (4, [0.0, 0.0, 1.0], 1),
        (5, [0.0, 0.01, 1.0], 1),
    ]
    idx = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cluster int"
    ).localCheckpoint()
    kept = semantic_dedup(idx, threshold=0.95, dim=3)
    assert sorted(r.vec_id for r in kept.collect()) == [1, 3, 4]
    # apply and stats agree: kept row count == sum of per-cluster n_kept
    stats = semantic_dedup_stats(idx, threshold=0.95, dim=3)
    assert kept.count() == sum(r.n_kept for r in stats.collect())


def test_top_ngram_stats_stamped_phrase(spark):
    # "ab cd " stamped 3 times: bigram "ab cd" occurs 3x (5 chars each),
    # doc chars = 17 ("ab cd ab cd ab cd") → top_cover 15, frac 15/17
    docs = _docs(
        spark,
        [
            (1, "ab cd ab cd ab cd", "en", "s"),
            (2, "all distinct words here now", "en", "s"),
        ],
    )
    out = {r.doc_id: r for r in curation.top_ngram_stats(docs, n=2).collect()}
    assert out[1].n_chars == 17
    assert out[1].top_cover == 15
    assert abs(out[1].top_ngram_frac - 15 / 17) < 1e-12
    # doc 2: every bigram occurs once → top_cover = longest bigram chars
    assert out[2].top_cover == len("distinct words")
    assert out[2].n_chars == len("all distinct words here now")


def test_top_ngram_stats_short_and_empty_docs(spark):
    # one-word doc: whole text is the single "gram", frac exactly 1;
    # empty doc: 0 chars, frac 0.0 (ANSI x/0 guard)
    docs = _docs(spark, [(1, "word", "en", "s"), (2, "", "en", "s")])
    out = {r.doc_id: r for r in curation.top_ngram_stats(docs, n=2).collect()}
    assert (out[1].n_chars, out[1].top_cover, out[1].top_ngram_frac) == (4, 4, 1.0)
    assert (out[2].n_chars, out[2].top_cover, out[2].top_ngram_frac) == (0, 0, 0.0)


def test_top_ngram_stats_trigram(spark):
    # n=3: "x y z" occurs twice (5 chars) → cover 10 over "x y z q x y z"
    docs = _docs(spark, [(1, "x y z q x y z", "en", "s")])
    r = curation.top_ngram_stats(docs, n=3).collect()[0]
    assert r.n_chars == 13
    assert r.top_cover == 10


def test_chunk_documents_offsets_and_overlap(spark):
    # 10 tokens, chunk 4, stride 3: starts 0,3,6,9 — last two short
    docs = _docs(spark, [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "en", "s")])
    out = sorted(
        (r.chunk_idx, r.start_tok, r.n_tok_chunk)
        for r in curation.chunk_documents(
            docs, chunk_tokens=4, stride=3
        ).collect()
    )
    assert out == [(0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)]


def test_chunk_documents_md5_is_exact_chunk_string(spark):
    import hashlib

    docs = _docs(spark, [(1, "a b c d e", "en", "s")])
    rows = {
        r.start_tok: r
        for r in curation.chunk_documents(
            docs, chunk_tokens=3, stride=2, keep_text=True
        ).collect()
    }
    assert rows[0].chunk_text == "a b c"
    assert rows[2].chunk_text == "c d e"
    assert rows[4].chunk_text == "e"
    for r in rows.values():
        assert r.chunk_md5 == hashlib.md5(r.chunk_text.encode()).hexdigest()


def test_chunk_documents_empty_doc_yields_no_chunks(spark):
    docs = _docs(spark, [(1, "", "en", "s"), (2, "one", "en", "s")])
    out = curation.chunk_documents(docs).collect()
    assert {r.doc_id for r in out} == {2}


def test_chunk_documents_full_coverage_property(spark):
    # every token position is covered by >= 1 chunk and by at most
    # ceil(chunk/stride) chunks; chunk starts are exactly the stride grid
    docs = _docs(
        spark,
        [(i, " ".join(f"w{j}" for j in range(n)), "en", "s")
         for i, n in enumerate([1, 2, 47, 48, 49, 64, 65, 100, 130])],
    )
    c, s = 64, 48
    rows = curation.chunk_documents(docs, chunk_tokens=c, stride=s).collect()
    import math

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    lens = [1, 2, 47, 48, 49, 64, 65, 100, 130]
    for i, n in enumerate(lens):
        chunks = by_doc[i]
        assert [r.start_tok for r in sorted(chunks, key=lambda r: r.chunk_idx)] == list(range(0, n, s))
        covered = [0] * n
        for r in chunks:
            for t in range(r.start_tok, r.start_tok + r.n_tok_chunk):
                covered[t] += 1
        assert min(covered) >= 1
        assert max(covered) <= math.ceil(c / s)


def test_write_training_shards_prunes_and_caps(spark, tmp_path):
    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.operators.split import hash_split

    docs = _docs(
        spark,
        [(i, f"text {i}", "en" if i % 2 else "de", "s") for i in range(400)],
    )
    out = str(tmp_path / "shards")
    curation.write_training_shards(
        hash_split(docs, "doc_id"), out, max_records_per_file=50
    )
    back = spark.read.parquet(out)
    assert back.count() == 400
    # partition pruning on the split/lang directories
    plan = back.filter(
        (F.col("split") == "train") & (F.col("lang") == "en")
    )._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan
    # file cap respected: no single parquet file holds > 50 rows
    import glob
    import os

    files = glob.glob(os.path.join(out, "**", "*.parquet"), recursive=True)
    assert files
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 50
    with pytest.raises(ValueError):
        curation.write_training_shards(docs, out, mode="overwite")


def test_chunk_and_top_ngram_match_python_reference_on_random_texts(spark):
    """Differential test on adversarial texts (whitespace runs, tabs,
    newlines, unicode, heavy repeats, 1-char words): the Spark plans
    must agree with a direct python reference of the same definitions."""
    import hashlib
    import random

    rng = random.Random(77)
    vocab = ["a", "bb", "ccc", "Ω", "naïve", "x" * 12, "q"]
    seps = [" ", "  ", "\t", "\n", " \t "]
    texts = []
    for i in range(40):
        n = rng.randint(0, 30)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.3 and n >= 2:  # stamp a phrase
            words = words[:2] * (n // 2)
        sep = rng.choice(seps)
        texts.append((i, sep.join(words) + (" " if rng.random() < 0.5 else "")))
    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in texts],
        "doc_id long, text string, lang string, source string",
    ).localCheckpoint()

    def norm_words(t):
        return [w for w in t.lower().strip().split() if w]

    # chunking reference
    c, s = 5, 3
    expect = {}
    for i, t in texts:
        w = norm_words(t)
        for start in range(0, len(w), s):
            chunk = w[start : start + c]
            expect[(i, start)] = (
                start // s,
                len(chunk),
                hashlib.md5(" ".join(chunk).encode()).hexdigest(),
            )
    got = {
        (r.doc_id, r.start_tok): (r.chunk_idx, r.n_tok_chunk, r.chunk_md5)
        for r in curation.chunk_documents(
            docs, chunk_tokens=c, stride=s
        ).collect()
    }
    assert got == expect

    # top-ngram reference (n=2)
    expect2 = {}
    for i, t in texts:
        w = norm_words(t)
        joined = " ".join(w)
        grams = (
            [" ".join(w[j : j + 2]) for j in range(len(w) - 1)]
            if len(w) >= 2
            else [joined]
        )
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        cover = max((cnt * len(g) for g, cnt in counts.items()), default=0)
        nch = len(joined)
        expect2[i] = (nch, cover, 0.0 if nch <= 0 else cover / nch)
    got2 = {
        r.doc_id: (r.n_chars, r.top_cover, r.top_ngram_frac)
        for r in curation.top_ngram_stats(docs, n=2).collect()
    }
    assert set(got2) == set(expect2)
    for k in expect2:
        assert got2[k][0] == expect2[k][0], (k, got2[k], expect2[k])
        assert got2[k][1] == expect2[k][1], (k, got2[k], expect2[k])
        assert abs(got2[k][2] - expect2[k][2]) < 1e-12


def test_equal_frequency_bins_matches_rank_formula(spark):
    # 12 rows, k=10: bins must follow rank*10 DIV 12 exactly under the
    # (value, id) total order — including duplicate values split across
    # a bin boundary by the id tiebreak
    rows = [(f"d{i:02d}", (i * 7) % 5) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id string, v long")
    got = {
        r.doc_id: r.bin
        for r in curation.equal_frequency_bins(df, "v", "doc_id", k=10).collect()
    }
    ranked = sorted(rows, key=lambda t: (t[1], t[0]))
    expect = {doc: (i * 10) // 12 for i, (doc, _) in enumerate(ranked)}
    assert got == expect


def test_equal_frequency_bins_balanced_sizes(spark):
    df = spark.createDataFrame(
        [(f"d{i:03d}", i % 17) for i in range(105)], "doc_id string, v long"
    )
    out = curation.equal_frequency_bins(df, "v", "doc_id", k=10).collect()
    sizes = {}
    for r in out:
        sizes[r.bin] = sizes.get(r.bin, 0) + 1
    # equal-frequency: every bin within 1 of every other, all 10 present
    assert set(sizes) == set(range(10))
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_equal_frequency_bins_empty(spark):
    df = spark.createDataFrame([], "doc_id string, v long")
    assert curation.equal_frequency_bins(df, "v", "doc_id", k=10).count() == 0


def test_bm25_ranks_rare_term_doc_first(spark):
    docs = _docs(
        spark,
        [
            (1, "common words common words rareword", "en", "s"),
            (2, "common words common words common words", "en", "s"),
            (3, "other text entirely unrelated here now", "en", "s"),
        ],
    )
    out = curation.bm25_topk(docs, ["rareword", "common"], k=3).collect()
    # doc 1 matches the rare term (high idf) AND the common one
    assert out[0].doc_id == 1
    assert out[0].n_terms_matched == 2
    # doc 3 matches nothing -> absent
    assert all(r.doc_id != 3 for r in out)
    # scores strictly ordered, ties impossible on this fixture
    assert out[0].bm25 > out[1].bm25 > 0


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf for the query term; the longer doc is penalized via dl/avgdl
    docs = _docs(
        spark,
        [
            (1, "hit filler", "en", "s"),
            (2, "hit " + " ".join(f"pad{i}" for i in range(40)), "en", "s"),
        ],
    )
    out = curation.bm25_topk(docs, ["hit"], k=2).collect()
    assert [r.doc_id for r in out] == [1, 2]


def test_bm25_empty_query_raises(spark):
    docs = _docs(spark, [(1, "a b", "en", "s")])
    with pytest.raises(ValueError):
        curation.bm25_topk(docs, [])


def test_bigram_lm_deterministic_transitions_score_one(spark):
    # every observed bigram transition is the ONLY continuation of its
    # prefix -> P(w2|w1) = 1 for all bigrams -> fluency exactly 1.0
    docs = _docs(
        spark,
        [
            (1, "a b c d", "en", "s"),
            (2, "a b c d", "en", "s"),
        ],
    )
    out = {r.doc_id: r for r in curation.bigram_lm_scores(docs).collect()}
    assert out[1].n_bigrams == 3 and out[1].fluency == 1.0
    assert out[2].fluency == 1.0


def test_bigram_lm_branching_prefix_halves_probability(spark):
    # prefix 'a' continues to b and to c once each -> P = 1/2 for both
    docs = _docs(
        spark,
        [
            (1, "a b", "en", "s"),
            (2, "a c", "en", "s"),
        ],
    )
    out = {r.doc_id: r for r in curation.bigram_lm_scores(docs).collect()}
    assert out[1].fluency == 0.5 and out[2].fluency == 0.5


def test_bigram_lm_short_and_empty_docs(spark):
    docs = _docs(
        spark,
        [(1, "", "en", "s"), (2, "word", "en", "s"), (3, "x y", "en", "s")],
    )
    out = {r.doc_id: r for r in curation.bigram_lm_scores(docs).collect()}
    assert out[1].n_bigrams == 0 and out[1].fluency == 0.0
    assert out[2].n_bigrams == 0 and out[2].fluency == 0.0
    assert out[3].n_bigrams == 1 and out[3].fluency == 1.0


def test_bm25_and_bigram_lm_match_python_reference_on_random_texts(spark):
    """Differential test: Spark BM25 scores and bigram-LM fluency must
    agree with direct python implementations of the same formulas on
    random corpora (repeats, short docs, empty docs, unicode)."""
    import math
    import random
    from decimal import Decimal, ROUND_HALF_UP

    rng = random.Random(99)
    vocab = ["alpha", "beta", "gamma", "δelta", "hit", "rare", "x"]
    texts = []
    for i in range(30):
        n = rng.randint(0, 25)
        words = [rng.choice(vocab) for _ in range(n)]
        texts.append((i, " ".join(words)))
    docs = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in texts],
        "doc_id long, text string, lang string, source string",
    ).localCheckpoint()

    def norm_words(t):
        return [w for w in t.lower().strip().split() if w]

    # --- BM25 reference (k1=1.2, b=0.75, same rounding pipeline) ---
    terms = ["hit", "rare"]
    k1, b = 1.2, 0.75
    corpus = {i: norm_words(t) for i, t in texts}
    N = len(corpus)
    total_dl = sum(len(w) for w in corpus.values())
    avgdl = total_dl * 1.0 / N
    df = {
        t: sum(1 for w in corpus.values() if t in w) for t in terms
    }
    ref_scores = {}
    for i, w in corpus.items():
        s = Decimal(0)
        matched = 0
        for t in terms:
            tf = w.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
            wgt = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(w) / avgdl)
            )
            s += Decimal(round(wgt, 9)).quantize(
                Decimal("0.0000000001"), rounding=ROUND_HALF_UP
            )
        if matched:
            ref_scores[i] = (matched, round(float(s), 6))
    top = sorted(
        ref_scores.items(), key=lambda kv: (-kv[1][1], kv[0])
    )[:10]
    got = curation.bm25_topk(docs, terms, k=10).collect()
    assert [(r.doc_id, r.n_terms_matched, r.bm25) for r in got] == [
        (i, m, s) for i, (m, s) in top
    ]

    # --- bigram-LM reference ---
    from collections import Counter

    c2, c1 = Counter(), Counter()
    for w in corpus.values():
        for a, bb in zip(w, w[1:]):
            c2[(a, bb)] += 1
            c1[a] += 1
    expect = {}
    for i, w in corpus.items():
        bgs = list(zip(w, w[1:]))
        if not bgs:
            expect[i] = (0, 0.0)
            continue
        s = Decimal(0)
        for g in bgs:
            s += Decimal(round(c2[g] * 1.0 / c1[g[0]], 9)).quantize(
                Decimal("0.0000000001"), rounding=ROUND_HALF_UP
            )
        expect[i] = (len(bgs), round(float(s) / len(bgs), 6))
    got2 = {
        r.doc_id: (r.n_bigrams, r.fluency)
        for r in curation.bigram_lm_scores(docs).collect()
    }
    assert got2 == expect


def test_bucketed_shingle_table_open_reregisters(spark, tmp_path):
    """Warm open over existing bucketed files: the builder must NOT
    re-run, and a session whose in-memory catalog lost the table (a
    fresh driver) must get the bucket layout re-registered via DDL."""
    from graphdb_for_drones_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "c d e f g h")], "doc_id long, text string"
    ).localCheckpoint()
    path = str(tmp_path / "shidx-test")

    built = curation.bucketed_shingle_table_open(
        spark,
        lambda: curation.shingle_index(docs, "train_id"),
        table="shidx_test_t1",
        path=path,
    )
    expect = sorted(tuple(r) for r in built.collect())
    assert len(expect) > 0

    # simulate a fresh session: drop the catalog entry, keep the files
    spark.sql("DROP TABLE shidx_test_t1")

    def _boom():  # pragma: no cover - the assertion is the point
        raise AssertionError("builder re-ran on a warm open")

    again = curation.bucketed_shingle_table_open(
        spark, _boom, table="shidx_test_t1", path=path
    )
    assert sorted(tuple(r) for r in again.collect()) == expect
    # the re-registered table still reports the bucket spec
    ddl = spark.sql("SHOW CREATE TABLE shidx_test_t1").collect()[0][0]
    assert "CLUSTERED BY" in ddl and "16 BUCKETS" in ddl
    spark.sql("DROP TABLE shidx_test_t1")


def test_bucketed_shingle_table_open_spec_mismatch_raises(spark, tmp_path):
    """A warm open whose arguments disagree with the persisted
    ``_bucket_spec.json`` must raise — registering the argument's
    layout over files with a different one silently drops join rows."""
    import pytest

    from graphdb_for_drones_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    ).localCheckpoint()
    path = str(tmp_path / "shidx-spec")
    curation.bucketed_shingle_table_open(
        spark,
        lambda: curation.shingle_index(docs, "train_id"),
        table="shidx_spec_t1",
        path=path,
        num_buckets=16,
        build_params={"n": 3},
    )
    with pytest.raises(ValueError, match="built with"):
        curation.bucketed_shingle_table_open(
            spark,
            lambda: curation.shingle_index(docs, "train_id"),
            table="shidx_spec_t1",
            path=path,
            num_buckets=8,
            build_params={"n": 3},
        )
    with pytest.raises(ValueError, match="built with"):
        curation.bucketed_shingle_table_open(
            spark,
            lambda: curation.shingle_index(docs, "train_id"),
            table="shidx_spec_t1",
            path=path,
            num_buckets=16,
            build_params={"n": 13},
        )
    spark.sql("DROP TABLE IF EXISTS shidx_spec_t1")


def test_bucketed_shingle_table_open_legacy_dir_rebuilds(spark, tmp_path):
    """A pre-spec directory (no ``_bucket_spec.json``) has an
    unverifiable layout: once AGED past the reader-safety window the
    open must rebuild it, not trust it; while YOUNG it must never
    delete it (another session may still be scanning those files) and
    never silently reuse it — instead it DETOURS to a ``-respec``
    sibling build so the caller keeps serving (round-8 ADVICE: the old
    raise was an hour-long availability cliff)."""
    import os
    import pytest

    from graphdb_for_drones_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "c d e f g h")], "doc_id long, text string"
    ).localCheckpoint()
    path = str(tmp_path / "shidx-legacy")
    built = curation.bucketed_shingle_table_open(
        spark,
        lambda: curation.shingle_index(docs, "train_id"),
        table="shidx_legacy_t1",
        path=path,
    )
    expect = sorted(tuple(r) for r in built.collect())
    os.remove(os.path.join(path, "_bucket_spec.json"))

    calls = []

    def rebuilt():
        calls.append(1)
        return curation.shingle_index(docs, "train_id")

    # young spec-less dir: never deleted (possible active reader) —
    # the open detours to a fresh ``-respec`` sibling and keeps serving
    detour = curation.bucketed_shingle_table_open(
        spark, rebuilt, table="shidx_legacy_t1", path=path
    )
    assert calls == [1]
    assert sorted(tuple(r) for r in detour.collect()) == expect
    assert os.path.isdir(path + "-respec")
    # legacy dir untouched: still there, still spec-less
    assert os.path.isdir(path)
    assert not os.path.isfile(os.path.join(path, "_bucket_spec.json"))
    # a second young open warm-opens the detour dir (no rebuild)
    again_young = curation.bucketed_shingle_table_open(
        spark, rebuilt, table="shidx_legacy_t1", path=path
    )
    assert calls == [1]
    assert sorted(tuple(r) for r in again_young.collect()) == expect
    # age every entry past the window -> rebuild in place
    old = (1_000_000_000, 1_000_000_000)
    for r, _d, files in os.walk(path):
        os.utime(r, old)
        for f in files:
            os.utime(os.path.join(r, f), old)
    again = curation.bucketed_shingle_table_open(
        spark, rebuilt, table="shidx_legacy_t1", path=path
    )
    assert calls == [1, 1]
    assert sorted(tuple(r) for r in again.collect()) == expect
    assert os.path.isfile(os.path.join(path, "_bucket_spec.json"))
    spark.sql("DROP TABLE IF EXISTS shidx_legacy_t1")
    spark.sql("DROP TABLE IF EXISTS shidx_legacy_t1_respec")


def test_pack_greedy_invariants_oversize_and_zero_token_docs(spark):
    """The gate corpus has neither oversize (>budget) nor zero-token
    documents, so the driver row can't exercise FFD's overflow edge:
    an oversize doc opens a pack with 0 remaining capacity and
    ZERO-TOKEN docs then first-fit into it (t=0 <= cap=0) — a legal
    2+ member pack whose total exceeds budget.  Every invariant
    boolean must still be TRUE (the oracle hardcodes TRUE), including
    on shards mixing oversize, zero-token, empty-text and normal
    docs."""
    from graphdb_for_drones_spark.plans.curation_queries import (
        _pack_greedy_invariants,
    )

    rows = [
        # shard 0: oversize + zero-token hitchhiker + normal
        (0, "en", " ".join(["w"] * 600)),
        (1, "en", ""),
        (2, "en", " ".join(["x"] * 100)),
        # shard 1 (doc_id 1000+): all zero-token
        (1000, "en", ""),
        (1001, "en", "   "),
        # shard 2: two oversize + fillers
        (2000, "de", " ".join(["a"] * 700)),
        (2001, "de", " ".join(["b"] * 600)),
        (2002, "de", ""),
        (2003, "de", " ".join(["c"] * 10)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).localCheckpoint()
    out = _pack_greedy_invariants(docs, budget=512).collect()
    assert len(out) == 3
    for r in out:
        for b in (
            "packs_within_budget",
            "tokens_conserved",
            "docs_conserved",
            "pack_count_ok",
            "at_most_one_halffull",
        ):
            assert r[b] is True, (r["lang"], r["shard"], b, r)


import pytest as _pytest
from hypothesis import HealthCheck as _HealthCheck
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st


@_pytest.mark.slow
@_settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[_HealthCheck.function_scoped_fixture],
)
@_given(
    lens=_st.lists(
        # token lengths spanning every FFD regime: empty, tiny, near-
        # budget, exactly budget, oversize (budget here is 64)
        _st.sampled_from([0, 1, 5, 30, 60, 63, 64, 65, 100, 200]),
        min_size=1,
        max_size=24,
    ),
    two_langs=_st.booleans(),
)
def test_pack_greedy_invariants_hold_on_random_corpora(
    spark, lens, two_langs
):
    """PROPERTY: every invariant boolean of the driver-gated
    `doc_pack_greedy_stats` entry is TRUE for any corpus — the oracle
    hardcodes TRUE, so a single False on any reachable input class is
    a latent red gate row (exactly the bug class the round-8 review
    caught on oversize+zero-token shards)."""
    from graphdb_for_drones_spark.plans.curation_queries import (
        _pack_greedy_invariants,
    )

    rows = [
        (
            i,
            ("en" if (not two_langs or i % 2 == 0) else "de"),
            " ".join(["w"] * n),
        )
        for i, n in enumerate(lens)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).localCheckpoint()
    for r in _pack_greedy_invariants(docs, budget=64).collect():
        for b in (
            "packs_within_budget",
            "tokens_conserved",
            "docs_conserved",
            "pack_count_ok",
            "at_most_one_halffull",
        ):
            assert r[b] is True, (r["lang"], r["shard"], b, r, lens)


def _unimax_reference(caps, budget):
    """Straight-line iterative waterfill: the definitionally-correct
    UniMax allocation the closed-form window formulation must match."""
    order = sorted(caps)  # list of (cap, lang)
    alloc, remaining = {}, budget
    left = len(order)
    for cap, lang in order:
        level = remaining / left if left else 0.0
        if cap < level:
            alloc[lang] = float(cap)
            remaining -= cap
        else:
            alloc[lang] = level
        left -= 1
    # uncapped ones all share the FINAL level, recompute in one pass
    capped = {l for c, l in order if alloc[l] == float(c) and c < budget}
    rem = budget - sum(c for c, l in order if l in capped)
    n_un = len(order) - len(capped)
    for c, l in order:
        if l not in capped:
            alloc[l] = rem / n_un if n_un else 0.0
    return alloc


def test_unimax_allocation_matches_reference(spark):
    rows = []
    toks = {"aa": 10, "bb": 50, "cc": 500, "dd": 0, "ee": 2000}
    i = 0
    for lang, n in toks.items():
        rows.append((i, " ".join(["w"] * n), lang, "s"))
        i += 1
    docs = _docs(spark, rows)
    budget, epochs = 1000, 2
    out = {
        r.lang: r
        for r in curation.unimax_allocation(
            docs, budget_tokens=budget, max_epochs=epochs
        ).collect()
    }
    ref = _unimax_reference(
        [(n * epochs, lang) for lang, n in toks.items()], budget
    )
    assert set(out) == set(toks)
    total = 0.0
    for lang, n in toks.items():
        r = out[lang]
        assert r.cap_tokens == n * epochs
        assert r.alloc_tokens == pytest.approx(ref[lang], abs=1e-9), lang
        # never over the epoch cap; epochs column consistent
        assert r.alloc_tokens <= r.cap_tokens + 1e-9
        if n > 0:
            assert r.epochs == pytest.approx(r.alloc_tokens / n)
        total += r.alloc_tokens
    # budget fully spent when total capacity allows it
    assert total == pytest.approx(min(budget, sum(n * epochs for n in toks.values())))


def test_unimax_allocation_edges(spark):
    docs = _docs(spark, [(1, "a b c", "en", "s"), (2, "d e", "de", "s")])
    # budget over total capacity: everything capped, leftover unspent
    out = {
        r.lang: r
        for r in curation.unimax_allocation(
            docs, budget_tokens=1_000_000, max_epochs=3
        ).collect()
    }
    assert out["en"].capped and out["de"].capped
    assert out["en"].alloc_tokens == 9.0 and out["de"].alloc_tokens == 6.0
    # zero budget: all-zero allocations, no divide-by-zero failure
    out0 = curation.unimax_allocation(docs, budget_tokens=0).collect()
    assert {r.alloc_tokens for r in out0} == {0.0}
    assert {r.weight for r in out0} == {0.0}
    with pytest.raises(ValueError, match="max_epochs"):
        curation.unimax_allocation(docs, max_epochs=0)


def test_bucketed_shingle_table_open_relocates_stale_registration(spark, tmp_path):
    """A catalog entry for ``table`` left pointing at a DIFFERENT path
    (failed-test leftover, co-encoding violation) must be re-registered
    over the requested path, not silently served — rows from the wrong
    index are the silent-wrong-data class the sidecar guards against."""
    from graphdb_for_drones_spark.operators import curation

    d1 = spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"
    ).localCheckpoint()
    d2 = spark.createDataFrame(
        [(2, "v w x y z"), (3, "v w x q r")], "doc_id long, text string"
    ).localCheckpoint()
    p1, p2 = str(tmp_path / "shidx-loc1"), str(tmp_path / "shidx-loc2")
    first = curation.bucketed_shingle_table_open(
        spark, lambda: curation.shingle_index(d1, "train_id"),
        table="shidx_reloc_t1", path=p1,
    )
    rows1 = sorted(tuple(r) for r in first.collect())
    second = curation.bucketed_shingle_table_open(
        spark, lambda: curation.shingle_index(d2, "train_id"),
        table="shidx_reloc_t1", path=p2,
    )
    rows2 = sorted(tuple(r) for r in second.collect())
    assert rows2 != rows1  # really reading p2, not the stale p1 entry
    assert {r[0] for r in rows2} == {2, 3}
    spark.sql("DROP TABLE IF EXISTS shidx_reloc_t1")


def test_sweep_legacy_shidx_dirs(tmp_path):
    """Only AGED pre-param-token dirs go; new-style dirs, young legacy
    dirs, and non-matching names survive."""
    import os
    import time

    from graphdb_for_drones_spark.operators.curation import (
        sweep_legacy_shidx_dirs,
    )

    root = tmp_path / "idx"
    root.mkdir()
    old = ("ab" * 4, "cd" * 8)
    aged_legacy = root / f"shidx-tr-{old[0]}-{old[1]}"
    young_legacy = root / f"shidx-ev-{old[0]}-{old[1]}"
    new_style = root / f"shidx-tr-n3-df100-b16-{old[0]}-{old[1]}"
    other = root / "unrelated-dir"
    for d in (aged_legacy, young_legacy, new_style, other):
        d.mkdir()
    ancient = (1_000_000_000, 1_000_000_000)
    os.utime(aged_legacy, ancient)
    os.utime(new_style, ancient)  # aged but NEW naming: must survive
    sweep_legacy_shidx_dirs(str(root))
    assert not aged_legacy.exists()
    assert young_legacy.exists()
    assert new_style.exists()
    assert other.exists()


def test_bucketed_shingle_table_open_non_json_build_params(spark, tmp_path):
    """build_params that don't round-trip through JSON verbatim (tuples
    become lists) must still warm-open: the spec comparison normalizes
    both sides through one JSON round-trip (round-8 ADVICE — the old
    ``spec != want`` made a fresh index fail its own immediate warm
    open forever)."""
    from graphdb_for_drones_spark.operators import curation

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "c d e f g h")], "doc_id long, text string"
    ).localCheckpoint()
    path = str(tmp_path / "shidx-tuple")
    params = {"grams": (3, 5), "max_df": 100}
    built = curation.bucketed_shingle_table_open(
        spark,
        lambda: curation.shingle_index(docs, "train_id"),
        table="shidx_tuple_t1",
        path=path,
        build_params=params,
    )
    expect = sorted(tuple(r) for r in built.collect())
    # immediate warm open with the SAME tuple-bearing params: must match
    warm = curation.bucketed_shingle_table_open(
        spark,
        lambda: (_ for _ in ()).throw(AssertionError("cold build ran")),
        table="shidx_tuple_t1",
        path=path,
        build_params=params,
    )
    assert sorted(tuple(r) for r in warm.collect()) == expect
    spark.sql("DROP TABLE IF EXISTS shidx_tuple_t1")


def test_canonical_location_uri_forms():
    """Catalog locations arrive as URIs (percent-escaped file:, hdfs://,
    s3a://) while callers pass OS paths — all equivalent spellings of
    the same location must canonicalize equal, and distinct locations
    must stay distinct (round-8 ADVICE: naive file:-splitting made every
    non-local warm open DROP/re-CREATE the table)."""
    from graphdb_for_drones_spark.operators.curation import (
        _canonical_location,
    )

    c = _canonical_location
    assert c("/a/b c") == c("file:/a/b%20c")
    assert c("file:///a/b c/") == c("/a/b c")
    assert c("hdfs://nn:8020/idx/x") == c("hdfs://nn:8020/idx/x/")
    assert c("s3a://bucket/idx/a%20b") == c("s3a://bucket/idx/a b")
    assert c("hdfs://nn:8020/idx/x") != c("hdfs://nn:8020/idx/y")
    assert c("/a/b") != c("/a/c")
