"""Property-based validation of the session's operators against
independent pure-Python references on random inputs (the
test_traversal_property pattern)."""

import hashlib
import math
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

GROUPS = list("wxyz")
ITEMS = list("abcde")

edge_strategy = st.lists(
    st.tuples(st.sampled_from(GROUPS), st.sampled_from(ITEMS)),
    min_size=0,
    max_size=20,
)


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_strategy)
def test_cooccurrence_matches_bruteforce(spark, edges):
    from graphdb_for_drones_spark.operators.graph_algorithms import (
        cooccurrence_similarity,
    )

    distinct = sorted(set(edges))
    if not distinct:
        return
    df = spark.createDataFrame(distinct, "g string, i string").localCheckpoint()
    got = {
        (r.id_a, r.id_b): (r.n_common, r.jaccard)
        for r in cooccurrence_similarity(df, "g", "i", k=1000).collect()
    }
    # brute force
    by_group = defaultdict(set)
    deg = defaultdict(int)
    for g, i in distinct:
        by_group[g].add(i)
        deg[i] += 1
    want = defaultdict(int)
    for g, items in by_group.items():
        items = sorted(items)
        for a in range(len(items)):
            for b in range(a + 1, len(items)):
                want[(items[a], items[b])] += 1
    assert set(got) == set(want)
    for k, n in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(
            n / (deg[k[0]] + deg[k[1]] - n)
        )


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=-2, max_value=50), min_size=1, max_size=25),
    k=st.integers(min_value=1, max_value=10),
)
def test_weighted_sample_matches_es_reference(spark, weights, k):
    from graphdb_for_drones_spark.operators.split import weighted_sample_topk

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long").localCheckpoint()
    got = [(r.doc_id, r.es_key) for r in weighted_sample_topk(df, "w", k=k).collect()]

    def md5_60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ref = []
    for i, w in rows:
        if w <= 0:
            continue
        u = (md5_60(f"{i}:w42") + 1) / float(1 << 60)  # (0,1] — the engine/oracle mapping
        ref.append((round(-math.log(u) / w, 9), i))
    ref.sort()
    assert got == [(i, key) for key, i in ref[:k]]


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ts=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=50_000),  # seconds offset
        ),
        min_size=1,
        max_size=25,
    )
)
def test_resample_grid_contiguous_and_total_preserving(spark, ts):
    import datetime as dt

    from graphdb_for_drones_spark.operators.temporal import resample_counts

    base = dt.datetime(2024, 1, 1)
    rows = [(g, base + dt.timedelta(seconds=s)) for g, s in ts]
    df = spark.createDataFrame(rows, "grp string, ts timestamp").localCheckpoint()
    out = resample_counts(df, "ts", "grp", bucket_ms=3_600_000).collect()
    per_group = defaultdict(list)
    for r in out:
        per_group[r.grp].append((r.bucket_start, r.n))
    want_counts = defaultdict(int)
    for g, s in ts:
        want_counts[g] += 1
    for g, buckets in per_group.items():
        buckets.sort()
        starts = [b for b, _ in buckets]
        # contiguous hourly grid, no holes
        assert starts == list(
            range(starts[0], starts[-1] + 3_600_000, 3_600_000)
        )
        # total events preserved across the grid
        assert sum(n for _, n in buckets) == want_counts[g]
    assert set(per_group) == set(want_counts)


word_strategy = st.text(alphabet="abcde", min_size=0, max_size=6)
corpus_strategy = st.lists(
    st.lists(word_strategy, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy)
def test_bpe_train_matches_python_reference_on_random_corpora(spark, texts):
    """Differential fuzz of the distributed BPE trainer: a 5-letter
    alphabet with tiny words forces dense count TIES, pinning the
    (count DESC, pair ASC) order, the chr(0xE000+r) re-segmentation and
    the early-stop path against a pure-Python twin."""
    from collections import Counter

    from graphdb_for_drones_spark.operators.text import bpe_train_list

    def py_train(words, n_merges):
        words = [w for w in words if len(w) >= 2]
        merges = []
        for r in range(1, n_merges + 1):
            counts = Counter()
            for w in words:
                for i in range(len(w) - 1):
                    counts[w[i : i + 2]] += 1
            if not counts:
                break
            pair, count = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((r, pair, count))
            sym = chr(0xE000 + r - 1)
            words = [w.replace(pair, sym) for w in words]
        return merges

    all_words = [w for t in texts for w in t.lower().strip().split()]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bpe_train_list(df, n_merges=4)
    assert got == py_train(all_words, 4)


key_strategy = st.lists(
    st.text(alphabet="ab\x00", min_size=0, max_size=4),
    min_size=0,
    max_size=24,
)


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=key_strategy, k=st.sampled_from([1, 2]))
def test_substitution_pairs_match_bruteforce(spark, keys, k):
    # tiny alphabet INCLUDING the sentinel char, lengths 0-4 (covering
    # the L <= max_subs corners), duplicates allowed: the wildcard
    # neighborhood must equal the quadratic hamming scan exactly
    from graphdb_for_drones_spark.operators.linkage import (
        substitution_neighborhood_pairs,
    )

    rows = [(i, key) for i, key in enumerate(keys)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "rid long, key string").localCheckpoint()
    out = substitution_neighborhood_pairs(df, "rid", "key", max_subs=k).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs))
    got = {
        (r.id_a, r.id_b): (r.hamming, tuple(r.diff_pos)) for r in out
    }
    want = {}
    for ia, ka in rows:
        for ib, kb in rows:
            if ia >= ib or not ka or not kb or len(ka) != len(kb):
                continue
            diff = tuple(
                p + 1 for p, (x, y) in enumerate(zip(ka, kb)) if x != y
            )
            if len(diff) <= k:
                want[(ia, ib)] = (len(diff), diff)
    assert got == want


drift_strategy = st.lists(
    st.tuples(
        st.sampled_from(["ref", "a", "b"]),
        st.integers(min_value=-50, max_value=500),
    ),
    min_size=1,
    max_size=40,
).filter(lambda rows: any(g == "ref" for g, _ in rows))


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=drift_strategy)
def test_distribution_drift_matches_bruteforce(spark, rows):
    """Engine drift vs a pure-Python reference computing the SAME
    integer binning, ordered folds and smoothing on random slices —
    incl. out-of-range clamps and empty bins."""
    from graphdb_for_drones_spark.operators.stats import distribution_drift

    df = spark.createDataFrame(
        rows, "g string, v long"
    ).localCheckpoint()
    got = {
        r.g: (r.n_rows, r.tvd, r.chi2, r.max_gap)
        for r in distribution_drift(df, "g", "v", "ref", n_bins=10).collect()
    }

    ref_vals = [v for g, v in rows if g == "ref"]
    lo, hi = min(ref_vals), max(ref_vals)
    width = hi - lo + 1

    def bins(vals):
        cs = [0] * 10
        for v in vals:
            # Spark `div` truncates toward zero; clamping makes the
            # negative-side difference from floor division irrelevant
            raw = (v - lo) * 10 // width if (v - lo) >= 0 else -1
            cs[max(0, min(9, raw))] += 1
        return cs

    by_g = defaultdict(list)
    for g, v in rows:
        by_g[g].append(v)
    rcs = bins(by_g["ref"])
    rn = len(by_g["ref"])
    for g, vals in by_g.items():
        cs = bins(vals)
        n = len(vals)
        p = [c / n for c in cs]
        q = [c / rn for c in rcs]
        qs = [(c + 1) / (rn + 10) for c in rcs]
        gaps = [abs(a - b) for a, b in zip(p, q)]
        tvd = 0.0
        for x in gaps:
            tvd += x
        chi = 0.0
        for a, b in zip(p, qs):
            chi += (a - b) * (a - b) / b
        assert got[g][0] == n
        assert got[g][1] == round(0.5 * tvd, 9)
        assert got[g][2] == round(chi, 9)
        assert got[g][3] == round(max(gaps), 9)
        assert 0.0 <= got[g][1] <= 1.0 and got[g][2] >= 0.0


corpus_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", "s3"]),
        st.lists(
            st.sampled_from(["red", "green", "blue", "cyan", "dot"]),
            min_size=0,
            max_size=6,
        ),
    ),
    min_size=0,
    max_size=15,
)


@pytest.mark.slow
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_strategy)
def test_vocab_overlap_matches_bruteforce(spark, docs):
    from graphdb_for_drones_spark.operators.text import vocab_overlap

    rows = [(g, " ".join(ws)) for g, ws in docs]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "source string, text string"
    ).localCheckpoint()
    got = {
        (r.source_a, r.source_b): (
            r.inter_types,
            r.union_types,
            r.jaccard,
            r.containment,
        )
        for r in vocab_overlap(df).collect()
    }
    vocab = defaultdict(set)
    for g, ws in docs:
        vocab[g] |= set(ws)
    keys = sorted(vocab)
    want = {}
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = keys[i], keys[j]
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue  # sparse-output contract: no shared term, no row
            union = len(vocab[a] | vocab[b])
            want[(a, b)] = (
                inter,
                union,
                round(inter / union, 9),
                round(inter / min(len(vocab[a]), len(vocab[b])), 9),
            )
    assert got == want
