"""Record-linkage (entity-resolution) primitives: fuzzy-match joins with
an exact-recall blocking scheme — all pure ``pyspark.sql.functions``
expressions (whole-stage codegen, no Python on the row path).

``substitution_neighborhood_pairs`` is the wildcard-neighborhood
generate-and-join (the FastSS family of approximate string joins): each
key emits one pattern per position subset of size ``min(max_subs, L)``
with those characters overwritten by a sentinel; two equal-length keys
within hamming distance ``max_subs`` agree outside their differing
positions, so they share the pattern at any subset covering those
positions — candidate recall is EXACT for substitution edits
(pigeonhole-free: the covering subset always exists).  Keys of
different lengths produce patterns of different lengths and never pair
— the operator's contract is SUBSTITUTION distance, the record-linkage
case (fixed-layout identifiers: account numbers, phone numbers, serial
ids), not general edit distance.

Pattern equality at the same position subset holds if and only if the
two keys agree on every non-wildcard position — regardless of the
sentinel character, even when keys contain it — so candidates carry no
false positives beyond hamming <= max_subs and the verify step is a
single position-wise comparison.

Why not substring banding: a band split guarantees the same recall
(pigeonhole) but block sizes track the key LAYOUT — a shared literal
prefix ("Customer#…") turns one band into a block holding the whole
table, C(n,2) candidates.  Wildcard blocks are keyed by L-1 (or L-2)
concrete characters, so block size is bounded by data duplication
(|alphabet|^k near-neighbors per key), not by where the entropy sits in
the key.

At 100 TB: the pattern exchange is the single data-scaled shuffle and
carries C(L, k) x n rows of (positions, pattern, id, key); the pair
stream is enumerated per posting list map-side and feeds partial
aggregation, and degenerate corpora (one key duplicated everywhere)
stream through ``posting_pairs``' hot-list self-join escape hatch
instead of materializing a C(n,2) array.  Cross-pattern duplicate
candidates are removed by canonical-owner FILTERING (a map-side
predicate on the two keys riding the pair row), never by a distinct
exchange of the candidate stream.

The reference has no fuzzy-match operator; this extends the dedup /
identity toolchain (operators/dedup.py's document near-dup pairs) to
record granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pos_subsets(key: Column, length: Column, k: int) -> Column:
    """array<struct<pos: array<int>, pat: string>> — one entry per
    position subset of size min(k, length), the key overwritten with
    NUL at those positions.  ``k`` in {1, 2}."""
    sentinel = F.lit("\x00")
    seq = F.sequence(F.lit(1), length)
    one = F.transform(
        seq,
        lambda i: F.struct(
            F.array(i).alias("pos"),
            F.overlay(key, sentinel, i, F.lit(1)).alias("pat"),
        ),
    )
    if k == 1:
        return one
    # sequence(a, b) runs BACKWARDS when a > b (yielding bogus subsets
    # like (L, L+1)-reversed for i = L), so the inner range is guarded
    # to empty at the last position
    two = F.flatten(
        F.transform(
            seq,
            lambda i: F.transform(
                F.when(i < length, F.sequence(i + 1, length)).otherwise(
                    F.array().cast("array<int>")
                ),
                lambda j: F.struct(
                    F.array(i, j).alias("pos"),
                    F.overlay(
                        F.overlay(key, sentinel, i, F.lit(1)),
                        sentinel,
                        j,
                        F.lit(1),
                    ).alias("pat"),
                ),
            ),
        )
    )
    # a 1-char key has no 2-subsets; its all-wildcard pattern IS the
    # 1-subset (min(k, L) = L), keeping recall exact for L <= k
    return F.when(length >= 2, two).otherwise(one)


def _owner_and_diff(ka: Column, kb: Column, max_subs: int):
    """(ownership predicate, differing-positions array) for a candidate
    pair read off the grouping key.

    Verification and ownership are O(k), not O(L): pattern equality
    already guarantees the keys agree OUTSIDE the wildcard positions,
    so only those <= k positions can differ — a full-key diff scan
    (an O(L) lambda filter, re-evaluated per reference because Spark
    CSE skips lambda-bearing subtrees) measured ~2x the whole pair
    stage at sf0.1.  F.get (not element_at: ANSI throws out-of-bounds)
    reads the 1-2 positions back out of the grouping key ``pos_key``."""
    pos_arr = F.split(F.col("pos_key"), ",").cast("array<int>")
    p1 = F.get(pos_arr, 0)
    d1 = F.substring(ka, p1, F.lit(1)) != F.substring(kb, p1, F.lit(1))
    empty = F.array().cast("array<int>")
    if max_subs == 1:
        # owner: the differing position itself, or position 1 for
        # identical keys (which share every pattern)
        own = d1 | (p1 == F.lit(1))
        diff = F.when(d1, F.array(p1)).otherwise(empty)
    else:
        p2 = F.get(pos_arr, 1)  # null on the L == 1 fallback rows
        d2 = F.when(p2.isNull(), F.lit(False)).otherwise(
            F.substring(ka, p2, F.lit(1)) != F.substring(kb, p2, F.lit(1))
        )
        # canonical owner subset: the differing positions completed
        # with the smallest non-differing ones (all sorted, p1 < p2)
        q = F.when(d1, p1).otherwise(p2)  # the single diff, when d==1
        own = F.when(p2.isNull(), d1 | (p1 == F.lit(1))).otherwise(
            (d1 & d2)
            | (
                (d1 != d2)
                & (p1 == F.lit(1))
                & (p2 == F.when(q == 1, F.lit(2)).otherwise(q))
            )
            | (~d1 & ~d2 & (p1 == F.lit(1)) & (p2 == F.lit(2)))
        )
        diff = F.concat(
            F.when(d1, F.array(p1)).otherwise(empty),
            F.when(d2, F.array(p2)).otherwise(empty),
        )
    return own, diff


def _pattern_rows(
    df: DataFrame, id_col: str, key_col: str, k: int, prefix: str
) -> DataFrame:
    """(id, key) → one row per wildcard pattern:
    (<prefix>id, <prefix>key, pos_key, pat)."""
    keyed = df.select(
        F.col(id_col).alias(f"{prefix}id"), F.col(key_col).alias(f"{prefix}key")
    ).filter(
        F.col(f"{prefix}key").isNotNull() & (F.length(f"{prefix}key") >= 1)
    )
    return keyed.select(
        f"{prefix}id",
        f"{prefix}key",
        F.explode(
            _pos_subsets(F.col(f"{prefix}key"), F.length(f"{prefix}key"), k)
        ).alias("pp"),
    ).select(
        f"{prefix}id",
        f"{prefix}key",
        F.concat_ws(",", F.col("pp.pos").cast("array<string>")).alias(
            "pos_key"
        ),
        F.col("pp.pat").alias("pat"),
    )


def substitution_neighborhood_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_key: str,
    right_id: str,
    right_key: str,
    max_subs: int = 1,
) -> DataFrame:
    """Cross-TABLE fuzzy join — the record-linkage form (match incoming
    records against a master table): every (left, right) pair whose
    equal-length keys are within ``max_subs`` substitutions, each pair
    exactly once.  Returns (id_l, id_r, key_l, key_r, hamming: long,
    diff_pos: array<int>); hamming 0 rows are exact key matches.

    Same wildcard-neighborhood blocking and O(k) canonical-owner dedup
    as ``substitution_neighborhood_pairs``, but candidates come from a
    plain equi-join of the two pattern streams on (positions, pattern)
    — Spark's join machinery streams hot patterns without posting
    lists, and either side may broadcast when dimension-sized."""
    if max_subs not in (1, 2):
        raise ValueError(
            f"max_subs={max_subs}: wildcard neighborhoods are exact and"
            " cheap only for radius 1-2 (C(L,k) patterns per key); use"
            " q-gram LSH for larger radii"
        )
    lp = _pattern_rows(left, left_id, left_key, max_subs, "l_")
    rp = _pattern_rows(right, right_id, right_key, max_subs, "r_")
    cand = lp.join(rp, ["pos_key", "pat"])
    ka, kb = F.col("l_key"), F.col("r_key")
    own, diff = _owner_and_diff(ka, kb, max_subs)
    return (
        cand.filter(own)
        .withColumn("diff_pos", diff)
        .select(
            F.col("l_id").alias("id_l"),
            F.col("r_id").alias("id_r"),
            ka.alias("key_l"),
            kb.alias("key_r"),
            F.size("diff_pos").cast("long").alias("hamming"),
            "diff_pos",
        )
    )


def substitution_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_subs: int = 1,
) -> DataFrame:
    """All pairs of rows whose keys are equal-length and within
    ``max_subs`` character substitutions (hamming distance), each pair
    exactly once with ``id_a < id_b``.

    Returns (id_a, id_b, key_a, key_b, hamming: long,
    diff_pos: array<int> — the differing positions, ascending).
    Null and empty keys never pair.  ``max_subs`` in {1, 2}: the
    neighborhood size is C(L, k) patterns per key, so larger radii
    belong to a different algorithm (LSH over q-gram sets), not a
    larger k here.

    Candidates come from grouping by (position-subset, pattern); a pair
    within hamming d <= k shares C(L-d, k-d) patterns, so each pair is
    kept only by its CANONICAL owner subset — the differing positions
    completed with the smallest non-differing ones — a map-side
    predicate on the keys riding the pair row (both keys travel inside
    the posting-list element, the simhash carrier trick, so ownership
    and verification need no join back onto the input)."""
    if max_subs not in (1, 2):
        raise ValueError(
            f"max_subs={max_subs}: wildcard neighborhoods are exact and"
            " cheap only for radius 1-2 (C(L,k) patterns per key); use"
            " q-gram LSH for larger radii"
        )
    from graphdb_for_drones_spark.operators._pin import pin
    from graphdb_for_drones_spark.operators.dedup import posting_pairs

    keyed = df.select(
        F.col(id_col).alias("rid"), F.col(key_col).alias("key")
    ).filter(F.col("key").isNotNull() & (F.length("key") >= 1))
    exploded = keyed.select(
        F.struct(F.col("rid").alias("id"), F.col("key")).alias("id"),
        F.explode(
            _pos_subsets(F.col("key"), F.length("key"), max_subs)
        ).alias("pp"),
    ).select(
        "id",
        F.concat_ws(",", F.col("pp.pos").cast("array<string>")).alias(
            "pos_key"
        ),
        F.col("pp.pat").alias("pat"),
    )
    buckets = (
        exploded.groupBy("pos_key", "pat")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    # posting_pairs reads the bucket table from three plan consumers;
    # unpinned, the explode + collect_list pipeline re-executes per
    # consumer (the r8/r9 posting-bucket tax — see operators/_pin)
    buckets = pin(buckets)
    cand = posting_pairs(buckets, ["pos_key", "pat"], keep_keys=True)
    ka, kb = F.col("id_a.key"), F.col("id_b.key")
    own, diff = _owner_and_diff(ka, kb, max_subs)
    return (
        cand.filter(own)
        .withColumn("diff_pos", diff)
        .select(
            F.col("id_a.id").alias("id_a"),
            F.col("id_b.id").alias("id_b"),
            ka.alias("key_a"),
            kb.alias("key_b"),
            F.size("diff_pos").cast("long").alias("hamming"),
            "diff_pos",
        )
    )
