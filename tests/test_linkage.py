"""substitution_neighborhood_pairs vs a naive all-pairs ground truth:
exact recall + exact-once enumeration for hamming <= max_subs, across
sentinel-containing keys, identical keys, mixed lengths, and the
L <= max_subs degenerate sizes."""

import itertools

import pytest

from graphdb_for_drones_spark.operators.linkage import (
    substitution_neighborhood_join,
    substitution_neighborhood_pairs,
)


def hamming(a: str, b: str):
    if len(a) != len(b):
        return None
    return sum(1 for x, y in zip(a, b) if x != y)


def naive_pairs(rows, k):
    out = {}
    for (ia, ka), (ib, kb) in itertools.combinations(sorted(rows), 2):
        if not ka or not kb:
            continue
        d = hamming(ka, kb)
        if d is not None and d <= k:
            out[(ia, ib)] = (
                ka,
                kb,
                d,
                tuple(
                    i + 1 for i, (x, y) in enumerate(zip(ka, kb)) if x != y
                ),
            )
    return out


KEYS = [
    "00123",
    "00124",
    "00123",  # identical pair
    "90123",
    "0012\x00",  # sentinel character inside a key
    "\x00012\x00",
    "abc",  # different length: never pairs with the 5-char keys
    "abd",
    "x",  # 1-char keys: L <= max_subs corner
    "y",
    "",  # empty: excluded by contract
]
ROWS = [(i, k) for i, k in enumerate(KEYS)]


@pytest.mark.parametrize("k", [1, 2])
def test_matches_naive_ground_truth(spark, k):
    df = spark.createDataFrame(ROWS, "rid long, key string")
    got = {
        (r.id_a, r.id_b): (
            r.key_a,
            r.key_b,
            r.hamming,
            tuple(r.diff_pos),
        )
        for r in substitution_neighborhood_pairs(
            df, "rid", "key", max_subs=k
        ).collect()
    }
    assert got == naive_pairs(ROWS, k)


def test_each_pair_exactly_once(spark):
    # keys at hamming 1 share C(L-1, k-1) = L-1 two-subsets at k=2:
    # the canonical-owner filter must keep exactly one of them
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab"), (3, "aaaa")], "rid long, key string"
    )
    rows = substitution_neighborhood_pairs(
        df, "rid", "key", max_subs=2
    ).collect()
    pairs = [(r.id_a, r.id_b) for r in rows]
    assert sorted(pairs) == [(1, 2), (1, 3), (2, 3)]
    by_pair = {(r.id_a, r.id_b): r for r in rows}
    assert by_pair[(1, 3)].hamming == 0 and by_pair[(1, 3)].diff_pos == []
    assert by_pair[(1, 2)].diff_pos == [4]


def naive_join(lrows, rrows, k):
    out = {}
    for (il, kl) in lrows:
        for (ir, kr) in rrows:
            if not kl or not kr:
                continue
            d = hamming(kl, kr)
            if d is not None and d <= k:
                out[(il, ir)] = (
                    kl,
                    kr,
                    d,
                    tuple(
                        i + 1
                        for i, (x, y) in enumerate(zip(kl, kr))
                        if x != y
                    ),
                )
    return out


@pytest.mark.parametrize("k", [1, 2])
def test_join_matches_naive_ground_truth(spark, k):
    lrows = [(i, key) for i, key in enumerate(KEYS)]
    rrows = [
        (100, "00123"),  # exact match of two left keys
        (101, "00125"),
        (102, "90124"),
        (103, "abq"),
        (104, "x"),
        (105, ""),
        (106, "\x00\x0012\x00"),
    ]
    ldf = spark.createDataFrame(lrows, "rid long, key string")
    rdf = spark.createDataFrame(rrows, "rid long, key string")
    out = substitution_neighborhood_join(
        ldf, rdf, "rid", "key", "rid", "key", max_subs=k
    ).collect()
    pairs = [(r.id_l, r.id_r) for r in out]
    assert len(pairs) == len(set(pairs)), "pair enumerated twice"
    got = {
        (r.id_l, r.id_r): (r.key_l, r.key_r, r.hamming, tuple(r.diff_pos))
        for r in out
    }
    assert got == naive_join(lrows, rrows, k)


def test_max_subs_validation(spark):
    df = spark.createDataFrame([(1, "a")], "rid long, key string")
    with pytest.raises(ValueError, match="max_subs=3"):
        substitution_neighborhood_pairs(df, "rid", "key", max_subs=3)


@pytest.mark.parametrize("k", [1, 2])
def test_property_random_corpus(spark, k):
    # deterministic pseudo-random corpus over a 3-letter alphabet with
    # heavy near-collisions (short keys, small alphabet)
    rows = []
    state = 12345
    for i in range(120):
        chars = []
        for _ in range(4):
            state = (state * 1103515245 + 12345) % (1 << 31)
            chars.append("abc"[state % 3])
        rows.append((i, "".join(chars)))
    df = spark.createDataFrame(rows, "rid long, key string")
    got = {
        (r.id_a, r.id_b): (r.key_a, r.key_b, r.hamming, tuple(r.diff_pos))
        for r in substitution_neighborhood_pairs(
            df, "rid", "key", max_subs=k
        ).collect()
    }
    assert got == naive_pairs(rows, k)
