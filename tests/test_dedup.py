"""Dedup operators on hand-built corpora with known duplicates."""

import pytest
from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_pairs,
)

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank"
DOC_A2 = "the quick brown fox jumps over the lazy dog near the river bend"  # 1 word off
DOC_B = "completely different content about spark query engines and shuffles"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, DOC_A),
        (2, DOC_A),              # exact dup of 1
        (3, "  The  quick brown fox jumps over the lazy dog near the river bank "),  # normalized dup
        (4, DOC_A2),             # near dup
        (5, DOC_B),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).localCheckpoint()


def test_exact_duplicates(corpus):
    groups = exact_duplicates(corpus).collect()
    assert len(groups) == 1
    assert groups[0].keeper_id == 1 and groups[0].dup_count == 3


def test_dedup_exact_keeps_min_id(corpus):
    kept = sorted(r.doc_id for r in dedup_exact(corpus).collect())
    assert kept == [1, 4, 5]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(shingles(F.col("text"), 3).alias("s")).first().s
    assert got == ["a b c", "b c d"]
    short = spark.createDataFrame([("a b",)], "text string")
    got2 = short.select(shingles(F.col("text"), 3).alias("s")).first().s
    assert got2 == ["a b"]


def test_minhash_finds_near_dup(corpus):
    pairs = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(corpus, jaccard_threshold=0.5).collect()}
    # exact dups always collide in every band; near dup (1,4) shares most shingles
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert (1, 4) in pairs
    assert not any(5 in p for p in pairs)


def test_ngram_jaccard_exact_values(corpus):
    rows = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(corpus, threshold=0.05).collect()}
    assert rows[(1, 2)] == 1.0
    # DOC_A has 11 distinct 3-gram shingles; DOC_A2 differs in last word →
    # shares 10 of them... compute: 13 words -> 11 shingles, last 1 changed
    assert 0.7 < rows[(1, 4)] < 1.0
    assert not any(5 in k for k in rows)


def test_simhash_near_dup_low_hamming(corpus):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(corpus, max_hamming=16).collect()}
    # identical docs → identical fingerprint; candidate generation is
    # GUARANTEED only for hamming < bands (pigeonhole), so only exact
    # dups are asserted present — near dups may or may not share a chunk
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 0 and pairs[(2, 3)] == 0
    # every reported pair respects the threshold
    assert all(h <= 16 for h in pairs.values())
    # unrelated doc 5 is far from the A-family under a tight threshold
    tight = {(r.id_a, r.id_b) for r in simhash_pairs(corpus, max_hamming=2).collect()}
    assert not any(5 in p for p in tight)


def test_prefix_filter_is_exact(corpus):
    plain = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(corpus, threshold=0.1).collect()
    }
    pf = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in ngram_jaccard_pairs(
            corpus, threshold=0.1, prefix_filter=True
        ).collect()
    }
    # PPJoin prefix filtering must be a pure optimization: same pairs,
    # same jaccard values
    assert pf == plain and len(plain) > 0


def test_minhash_md5_behaves_like_fast_variant(corpus):
    from graphdb_for_drones_spark.operators.dedup import minhash_lsh_pairs_md5

    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs_md5(corpus, jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    assert not any(5 in p for p in pairs)


def test_minhash_recall_on_planted_exact_dups(spark):
    # exact duplicates agree on every permutation, hence on every band:
    # recall on planted exact dups must be 1.0 regardless of corpus
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    docs, planted = [], []
    for i in range(40):
        text = " ".join(rng.choice(vocab) for _ in range(30))
        docs.append((2 * i, text))
        if i % 4 == 0:
            docs.append((2 * i + 1, text))
            planted.append((2 * i, 2 * i + 1))
    df = spark.createDataFrame(
        docs, "doc_id long, text string"
    ).coalesce(2).localCheckpoint()
    found = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.99).collect()
    }
    assert set(planted) <= found
    # and every reported pair genuinely meets the threshold (verification
    # join is exact)
    vals = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()
    }
    assert all(v >= 0.5 for v in vals.values())


def test_simhash_hot_bucket_subband_recall_exact(spark, monkeypatch):
    # a bucket beyond SUBBAND_POSTING_SIZE takes the sub-banding
    # recursion, not the streaming self-join: recall must stay exact
    # and each pair must surface exactly once (nested ownership).
    # The threshold is patched down so a 1.2k-member bucket recurses.
    import random

    import graphdb_for_drones_spark.operators.dedup as dd
    from graphdb_for_drones_spark.operators.dedup import (
        HOT_POSTING_SIZE,
        simhash_candidate_pairs,
    )

    monkeypatch.setattr(dd, "SUBBAND_POSTING_SIZE", HOT_POSTING_SIZE)
    rng = random.Random(7)
    max_h = 2  # bands = 3 over 64 bits -> band 0 = bits [0, 22)
    n = HOT_POSTING_SIZE + 180

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    # every fingerprint has band-0 chunk 0 -> ONE bucket holds them all
    fps_u = [rng.getrandbits(42) << 22 for _ in range(n)]
    for src, h in [(0, 1), (1, 2), (2, 2), (3, 0)]:
        v = fps_u[src]
        for b in rng.sample(range(22, 64), h):
            v ^= 1 << b
        fps_u.append(v)
    rows = [(f"d{i:04d}", signed(u)) for i, u in enumerate(fps_u)]
    fp_df = spark.createDataFrame(
        rows, "id string, fp long"
    ).localCheckpoint()

    out = simhash_candidate_pairs(fp_df, max_h).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs)), "pair enumerated twice"
    got = {(r.id_a, r.id_b): r.hamming for r in out}
    want = {}
    for i in range(len(fps_u)):
        for j in range(i + 1, len(fps_u)):
            d = bin(fps_u[i] ^ fps_u[j]).count("1")
            if d <= max_h:
                want[(f"d{i:04d}", f"d{j:04d}")] = d
    assert got == want


def test_simhash_candidate_recall_exact(spark):
    # pigeonhole property: with bands > max_hamming (the enforced default)
    # the banded candidate scheme equals brute force EXACTLY within the
    # radius — plant pairs at controlled hamming distances and compare
    import random

    from graphdb_for_drones_spark.operators.dedup import (
        resolve_bands,
        simhash_candidate_pairs,
    )

    rng = random.Random(42)
    max_h = 8

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    fps_u = [rng.getrandbits(64) for _ in range(40)]
    # plant near-dups at distances 0..max_h (and one just outside)
    for src, h in [(0, 0), (1, 1), (2, 4), (3, 8), (4, max_h + 1)]:
        v = fps_u[src]
        for b in rng.sample(range(64), h):
            v ^= 1 << b
        fps_u.append(v)
    rows = [(f"d{i:03d}", signed(u)) for i, u in enumerate(fps_u)]
    fp_df = spark.createDataFrame(rows, "id string, fp long").localCheckpoint()

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_candidate_pairs(fp_df, max_h).collect()
    }
    want = {}
    for i in range(len(fps_u)):
        for j in range(i + 1, len(fps_u)):
            d = bin(fps_u[i] ^ fps_u[j]).count("1")
            if d <= max_h:
                want[(f"d{i:03d}", f"d{j:03d}")] = d
    assert got == want  # full recall within radius, no extras, exact distances
    assert ("d000", "d040") in got and got[("d000", "d040")] == 0
    assert ("d003", "d043") in got and got[("d003", "d043")] == 8

    # contract enforcement: under-provisioned bands raise...
    import pytest as _pytest

    with _pytest.raises(ValueError):
        resolve_bands(8, 4)
    # ...unless partial recall is explicitly accepted
    assert resolve_bands(8, 4, allow_partial_recall=True) == 4
    assert resolve_bands(8, None) == 9


def test_posting_pairs_hot_path_equivalence(spark, corpus, monkeypatch):
    """Skew-adaptive pair enumeration: forcing every posting list down
    the streamed self-join path (HOT_POSTING_SIZE=0 ≈ all hot) must give
    the identical jaccard result as the map-side array path."""
    from graphdb_for_drones_spark.operators import dedup as D

    baseline = D.ngram_jaccard_pairs(corpus, threshold=0.1).collect()
    monkeypatch.setattr(D, "HOT_POSTING_SIZE", 0)
    hot = D.ngram_jaccard_pairs(corpus, threshold=0.1).collect()
    assert sorted((r.id_a, r.id_b, round(r.jaccard, 12)) for r in baseline) == sorted(
        (r.id_a, r.id_b, round(r.jaccard, 12)) for r in hot
    )


def test_posting_pairs_mixed_paths(spark, monkeypatch):
    """A posting table that straddles the hot threshold: both paths fire
    in one plan and the union holds exactly the expected pairs."""
    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.operators import dedup as D

    monkeypatch.setattr(D, "HOT_POSTING_SIZE", 3)
    posting = spark.createDataFrame(
        [("small", [1, 2]), ("hot", [10, 11, 12, 13])],
        "h string, ids array<int>",
    ).localCheckpoint()
    got = sorted(
        (r.id_a, r.id_b) for r in D.posting_pairs(posting, ["h"]).collect()
    )
    expect = sorted(
        [(1, 2)]
        + [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    )
    assert got == expect


def test_posting_pairs_hot_null_key_group(spark, monkeypatch):
    """A NULL posting key whose list crosses HOT_POSTING_SIZE (round-9
    ADVICE): the hot branch's self-join must be null-SAFE, else the
    NULL group silently loses every pair while the map-side small path
    keeps it — the two paths must agree on NULL keys at any size."""
    from graphdb_for_drones_spark.operators import dedup as D

    posting = spark.createDataFrame(
        [(None, [1, 2, 3, 4]), ("k", [7, 8])],
        "h string, ids array<int>",
    ).localCheckpoint()
    def snap():
        return sorted(
            (
                (r.h, r.id_a, r.id_b)
                for r in D.posting_pairs(
                    posting, ["h"], keep_keys=True
                ).collect()
            ),
            key=lambda t: (t[0] is not None, t[0] or "", t[1], t[2]),
        )

    small = snap()
    monkeypatch.setattr(D, "HOT_POSTING_SIZE", 3)  # NULL group goes hot
    mixed = snap()
    assert small == mixed
    assert (None, 1, 2) in mixed  # hot NULL group kept its pairs


def test_wide_gram_family_identical_across_builders(spark):
    """The n>8 shingle-hash family is a function of n alone
    (ADVICE r7): ``shingle_hash_array`` and ``with_shingle_hashes``
    must emit bit-identical hash arrays at wide gram widths, incl.
    the short-doc whole-text fallback — a family split silently
    zeroes any join between the two builders' outputs."""
    from pyspark.sql import functions as F

    from graphdb_for_drones_spark.operators.dedup import (
        shingle_hash_array,
        with_shingle_hashes,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(30))),
            (2, " ".join(f"w{i}" for i in range(13))),  # exactly n words
            (3, "short doc under n words"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    for n in (13, 9, 16, 3):
        via_expr = {
            r["doc_id"]: r["h"]
            for r in docs.select(
                "doc_id", shingle_hash_array(F.col("text"), n).alias("h")
            ).collect()
        }
        via_staged = {
            r["doc_id"]: r["h"]
            for r in with_shingle_hashes(
                docs, "text", n, out_col="h", keep=("doc_id",)
            ).collect()
        }
        assert via_expr == via_staged, f"family split at n={n}"


def test_minhash_simhash_invariant_entries_planted_corpus(spark, tmp_path):
    """The gate corpus has ZERO exact-duplicate texts, so the driver row
    can't exercise `finds_all_exact_dups` beyond the vacuous case — this
    pins the invariant entries (`minhash_pairs` / `simhash_pairs`,
    retired from rows-only in r9) on a corpus with planted exact dups,
    near dups, and unrelated docs: every boolean TRUE, dup-pair count
    exact, and the booleans are FALSIFIABLE (a corpus-independent check
    that the miss-detection probe actually counts misses)."""
    from graphdb_for_drones_spark.plans.llm_queries import (
        _exact_dup_pairs,
        q_minhash_pairs,
        q_simhash_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again today"
    )
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),          # exact dup of 1
        (3, base, "en", "s", len(base)),          # exact dup of 1, 2
        (4, base.replace("dog", "cat"), "en", "s", len(base)),  # near dup
        (5, "completely different text about spark query planning and shuffles here", "en", "s", 10),
        (6, "another unrelated document mentioning parquet files and columnar storage", "en", "s", 10),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    dups = sorted(
        (r.id_a, r.id_b) for r in _exact_dup_pairs(docs).collect()
    )
    assert dups == [(1, 2), (1, 3), (2, 3)]

    for q in (q_minhash_pairs, q_simhash_pairs):
        out = q(spark, str(tmp_path)).collect()
        assert len(out) == 1
        row = out[0].asDict()
        assert row["n_docs"] == 6
        assert row["n_exact_dup_pairs"] == 3
        bools = {k: v for k, v in row.items() if isinstance(v, bool)}
        assert bools and all(bools.values()), bools


def test_minhash_md5_universal_family_invariants(spark):
    """The r9 universal-hash family must keep MinHash's two load-bearing
    properties: (a) exact-recall on identical texts (identical hashed
    shingle sets => identical (a_j*x+b_j) mins => same digest in every
    band), and (b) exact verification (every reported jaccard meets the
    threshold and equals the hashed-set jaccard).  Also pins the
    coefficient derivation: deterministic, in-range, distinct."""
    import random

    from graphdb_for_drones_spark.operators.dedup import (
        MD5_MINHASH_PRIME,
        md5_universal_coeffs,
        minhash_lsh_pairs_md5,
    )

    a, b = md5_universal_coeffs(16)
    assert (a, b) == md5_universal_coeffs(16)  # deterministic
    assert all(1 <= x < MD5_MINHASH_PRIME for x in a)
    assert all(0 <= x < MD5_MINHASH_PRIME for x in b)
    assert len(set(zip(a, b))) == 16  # distinct permutations

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    docs, planted = [], []
    for i in range(40):
        text = " ".join(rng.choice(vocab) for _ in range(30))
        docs.append((2 * i, text))
        if i % 4 == 0:
            docs.append((2 * i + 1, text))
            planted.append((2 * i, 2 * i + 1))
    df = (
        spark.createDataFrame(docs, "doc_id long, text string")
        .coalesce(2)
        .localCheckpoint()
    )
    found = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs_md5(df, jaccard_threshold=0.99).collect()
    }
    assert set(planted) <= found
    vals = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs_md5(df, jaccard_threshold=0.5).collect()
    }
    assert all(v >= 0.5 for v in vals.values())
