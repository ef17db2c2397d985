"""Text analysis operators for training-data pipelines — all pure
``pyspark.sql.functions`` expressions (whole-stage codegen, no Python on
the row path): token counting, quality scoring, language-ID heuristic,
document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")

# tiny marker-word lists for the n-gram/marker language-ID heuristic;
# deliberately deterministic and dependency-free
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "zh": ("的", "是", "了", "在", "我"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenizer (empty-safe)."""
    return F.filter(
        F.split(F.trim(col), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored token estimate: word pieces + punctuation — a
    deterministic stand-in for a real tokenizer's token count.

    Counted as |maximal ``\\w+`` runs| + |non-word, non-space chars|,
    which equals the boundary-split formulation (split at every
    word/non-word boundary, drop whitespace pieces: each \\w run is one
    piece, each remaining printable char its own piece — pinned in
    tests) but uses only RE2-compatible patterns, so the DuckDB oracle
    twin evaluates the same regex text and the metric is
    driver-hash-checkable."""
    words = F.size(F.regexp_extract_all(col, F.lit(r"\w+"), 0))
    punct = F.size(F.regexp_extract_all(col, F.lit(r"[^\w\s]"), 0))
    return (words + punct).cast("long")


def stopword_ratio_from_tokens(toks: Column, stopwords=STOPWORDS) -> Column:
    """Stopword share over a LOWERCASED token-array column; 0.0 for
    token-less documents (ANSI mode makes the bare division a JOB
    FAILURE on an empty doc — caught by the degenerate-fixture sweep).
    Pass a materialized column on hot paths: subexpression elimination
    skips lambda-bearing subtrees, so an inline ``tokens(...)``
    argument is re-tokenized at each of the two references here."""
    sw = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    n = F.size(toks)
    return F.when(n > 0, sw / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords=STOPWORDS) -> Column:
    return stopword_ratio_from_tokens(tokens(F.lower(col)), stopwords)


def punct_ratio(col: Column) -> Column:
    """Punctuation character share; 0.0 for empty text (ANSI guard)."""
    no_punct = F.regexp_replace(col, r"[^\w\s]", "")
    n = F.length(col)
    return F.when(n > 0, (n - F.length(no_punct)) / n).otherwise(F.lit(0.0))


def quality_score_parts(n_tok: Column, sw_ratio: Column, p_ratio: Column) -> Column:
    """The quality composite over precomputed parts — lets staged plans
    share one tokenization across n_tokens/stopword/quality columns."""
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_score = F.least(sw_ratio * 5, F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - p_ratio * 4, F.lit(0.0))
    return F.round((len_score + sw_score + punct_pen) / 3, 6)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-range length and
    stopword presence, penalizes punctuation soup — the usual cheap
    pre-filter before expensive model-based scoring."""
    return quality_score_parts(
        token_count(col), stopword_ratio(col), punct_ratio(col)
    )


def lang_id_from_tokens(toks: Column) -> Column:
    """Marker-word language ID over a LOWERCASED token-array column:
    argmax over per-language marker hit counts, ties broken by
    language-code order; 'und' when no marker hits.  Same staging
    contract as ``stopword_ratio_from_tokens`` (the argmax references
    the array once per language)."""

    def is_marker(markers):
        # closure factory (a 2-param lambda would receive the element index)
        return lambda t: t.isin(*markers)

    scored = [
        F.struct(
            F.size(F.filter(toks, is_marker(markers))).alias("hits"),
            # negate lexicographic rank so greatest() prefers earlier codes on ties
            F.lit(-i).alias("rank"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, markers) in enumerate(sorted(LANG_MARKERS.items()))
    ]
    best = F.greatest(*scored)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(col: Column) -> Column:
    """One-expression form; hot paths stage the token array first."""
    return lang_id_from_tokens(tokens(F.lower(col)))


def fingerprint(col: Column, modulus: int = 1_000_000_007) -> Column:
    """Deterministic polynomial rolling hash over characters — the
    cross-engine-checkable document fingerprint.  In production prefer
    ``F.xxhash64(col)`` (one codegen op); this variant exists because its
    value is reproducible in any engine, for oracle checks.

    Folds over ``split(col, '')`` rather than per-index ``substr``:
    UTF8 position seeks are O(i), so the substr form is O(len²) per
    document — measured 2.3× slower at sf0.1, identical values."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % modulus,
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: token count, stopword ratio, punct ratio,
    quality, predicted language, fingerprint.  Tokenizes ONCE per case
    form: the metric expressions reference staged token-array columns
    (inline forms would tokenize ~11× per row — the lambda-CSE tax)."""
    c = F.col(text_col)
    staged = df.withColumns(
        {"__t": tokens(c), "__tl": tokens(F.lower(c)), "__pr": punct_ratio(c)}
    )
    n_tok = F.size(F.col("__t")).cast("long")
    swr = stopword_ratio_from_tokens(F.col("__tl"))
    return staged.withColumns(
        {
            "n_tokens": n_tok,
            "stopword_ratio": F.round(swr, 6),
            "punct_ratio": F.round(F.col("__pr"), 6),
            "quality": quality_score_parts(n_tok, swr, F.col("__pr")),
            "pred_lang": lang_id_from_tokens(F.col("__tl")),
            "fingerprint": fingerprint(c),
        }
    ).drop("__t", "__tl", "__pr")


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003 — the MOSS algorithm): per document, hash every word
    ``k``-gram (engine-neutral md5-60), slide a ``window`` of
    consecutive hashes, select the MINIMUM of each window (leftmost on
    ties), and report the distinct selected set — the guarantee-bearing
    fingerprint sample (any shared run of ``window + k - 1`` tokens
    between two documents yields a shared selected hash; expected
    density 2/(window+1)).

    Returns (doc_id, n_grams, n_selected, min_fp) — all exact integers,
    driver-hash-checkable.  Plan: two projection boundaries stage the
    word array then the hash array (the slice-under-lambda rule: a
    lambda-bound ``slice`` must target a plain attribute, which staging
    guarantees); everything else is codegen array algebra — one scan,
    zero shuffles, zero Python.  Docs shorter than ``k`` words
    contribute their whole text as the single gram (the shingle-family
    convention)."""
    from graphdb_for_drones_spark.operators.dedup import (
        _spread_input,
        normalize_text,
    )
    from graphdb_for_drones_spark.operators.split import _md5_60bit

    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda t: t != F.lit(""),
    )
    # r12 (guide §2): the gram-hash fold is the dominant CPU; a
    # single-split source would serialize it onto one core (profiled:
    # one 4 s task at sf0.1).  No-op at real corpus scale.
    staged = _spread_input(df, id_col, text_col).select(
        F.col(id_col).alias("doc_id"), words.alias("__w")
    )
    w = F.col("__w")
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - k, F.lit(0)))

    def gram_hash(i):
        return _md5_60bit(F.concat_ws(" ", F.slice(w, i + 1, k)))

    grams = F.when(
        F.size(w) < k, F.array(_md5_60bit(F.concat_ws(" ", w)))
    ).otherwise(F.transform(idx, gram_hash))
    hashed = staged.select("doc_id", grams.alias("__h"))
    h = F.col("__h")
    jdx = F.sequence(F.lit(0), F.greatest(F.size(h) - window, F.lit(0)))

    def pick(j):
        sl = F.slice(h, j + 1, window)
        return F.struct(
            F.array_min(sl).alias("fp"),
            (j + F.array_position(sl, F.array_min(sl))).alias("pos"),
        )

    sel = F.array_distinct(F.transform(jdx, pick))
    return hashed.select(
        "doc_id",
        F.size(h).cast("long").alias("n_grams"),
        F.size(sel).cast("long").alias("n_selected"),
        F.array_min(F.transform(sel, lambda s: s["fp"])).alias("min_fp"),
    )


def _bpe_words(text_col) -> Column:
    """The ONE tokenization every BPE stage shares (merge counting,
    training, segmentation): normalized whitespace words of length >= 2
    (a 1-char word has no pair and no merge can ever apply to it).  The
    trainer and the segmenter MUST tokenize identically for
    ``bpe_segment_stats`` to reproduce training statistics — keep this
    the single definition."""
    from graphdb_for_drones_spark.operators.dedup import normalize_text

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(normalize_text(col), " "),
        lambda t: F.length(t) >= 2,
    )


def bpe_merge_pairs(
    df: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """BPE merge induction, first scan: corpus-wide frequencies of
    adjacent CHARACTER pairs within words — exactly the statistic a BPE
    tokenizer trainer (Sennrich et al. 2016, arXiv:1508.07909) computes
    to pick its first merge; re-running on re-segmented text yields the
    next merge, so this is the distributed kernel of vocab training.

    Returns the top-``k`` (pair, pair_count) rows under the total order
    (count DESC, pair ASC) — tie-free, hash-checkable.  Plan: two
    nested explodes (words, then in-word char pairs) feeding a hash
    aggregate whose key space is bounded by |alphabet|² — map-side
    partial aggregation collapses the exploded stream before the
    shuffle, and the top-k is a TakeOrdered over the tiny aggregate.
    One scan, one bounded shuffle, zero Python — at 100 TB the shuffle
    carries at most a few thousand (pair, count) rows per task.

    Mirrors the tokenizer-training half of the reference's text
    handling surface (the reference stores VC/DID payloads as text and
    outsources all tokenization; SURVEY.md §2 text-analysis family)."""
    w = df.select(F.explode(_bpe_words(text_col)).alias("__word"))
    word = F.col("__word")
    pairs = F.transform(
        F.sequence(F.lit(1), F.length(word) - 1),
        lambda i: word.substr(i, F.lit(2)),
    )
    return (
        w.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
        .limit(k)
    )


def vocab_stats(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group vocabulary report: token count, type (distinct-term)
    count, hapax-legomenon count (terms occurring exactly once in the
    group), and the type-token ratio — the Heaps-law numbers a
    tokenizer-budget / vocab-size planner reads per corpus slice.

    Plan: ONE shuffle on (group, term) with map-side combine builds the
    per-term counts; the rollup to one row per group is a second,
    group-cardinality-sized aggregate.  Deliberately avoids
    ``countDistinct`` so no Expand node appears (the multi-distinct
    Expand tax measured in PERF.md); hapax falls out of the same
    per-term counts for free.  TTR is one IEEE division of exact
    integers — bit-identical across engines."""
    from graphdb_for_drones_spark.operators.dedup import normalize_text

    words = F.filter(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda t: t != F.lit(""),
    )
    toks = df.select(
        F.col(group_col), F.explode(words).alias("__term")
    )
    per = toks.groupBy(group_col, "__term").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return per.groupBy(group_col).agg(
        F.sum("__c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
    ).select(
        group_col,
        "n_tokens",
        "n_types",
        "n_hapax",
        (F.col("n_types") * F.lit(1.0) / F.col("n_tokens")).alias(
            "type_token_ratio"
        ),
    )


def vocab_overlap(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Pairwise VOCABULARY overlap between corpus slices — the
    dataset-similarity report a mixture planner reads before merging
    sources (near-identical vocabularies ⇒ redundant slices; disjoint
    ⇒ complementary coverage): for every unordered slice pair, the
    shared type count, union type count, jaccard, and containment
    (shared / smaller vocabulary).

    Plan shape at 100 TB: ONE (group, term)-distinct shuffle builds the
    term → groups posting lists; each list is bounded by the GROUP
    cardinality (sources, not rows), so pair enumeration is always the
    map-side ``pairs_from_sorted_ids`` array path — no self-join, no
    quadratic candidate stream — and the rollup is a (|groups|²)-sized
    aggregate.  Per-slice type counts broadcast onto the pair rows.
    Jaccard/containment are single IEEE divisions of exact integers —
    bit-identical across engines."""
    from graphdb_for_drones_spark.operators.dedup import (
        pairs_from_sorted_ids,
    )

    terms = df.select(
        F.col(group_col).alias("g"), F.explode(_words(text_col)).alias("t")
    ).distinct()
    sizes = terms.groupBy("g").agg(F.count(F.lit(1)).alias("n_types"))
    posting = (
        terms.groupBy("t")
        .agg(F.sort_array(F.collect_set("g")).alias("gs"))
        .filter(F.size("gs") >= 2)
    )
    inter = (
        posting.select(
            F.explode(pairs_from_sorted_ids(F.col("gs"))).alias("p")
        )
        .groupBy(
            F.col("p.id_a").alias("source_a"),
            F.col("p.id_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("inter_types"))
    )
    a = sizes.select(
        F.col("g").alias("source_a"), F.col("n_types").alias("__ta")
    )
    b = sizes.select(
        F.col("g").alias("source_b"), F.col("n_types").alias("__tb")
    )
    union = (F.col("__ta") + F.col("__tb") - F.col("inter_types")).cast(
        "long"
    )
    return (
        inter.join(F.broadcast(a), "source_a")
        .join(F.broadcast(b), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter_types",
            union.alias("union_types"),
            F.round(
                F.col("inter_types") / union.cast("double"), 9
            ).alias("jaccard"),
            F.round(
                F.col("inter_types")
                / F.least("__ta", "__tb").cast("double"),
                9,
            ).alias("containment"),
        )
    )


def _words(text_col) -> Column:
    """Normalized non-empty whitespace words — the tokenization shared
    by the df-table and classifier operators, mirroring the DuckDB
    oracles' ``_WORDS`` fragment.  Single engine-side home (the BPE
    family's min-length-2 variant is ``_bpe_words``)."""
    from graphdb_for_drones_spark.operators.dedup import normalize_text

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(normalize_text(col), " "), lambda t: t != F.lit("")
    )


def hashed_logit_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    seed: int = 7,
    carry_cols: tuple = (),
) -> DataFrame:
    """Model-based quality filtering: a linear classifier over hashed
    bag-of-words features — the fastText-style quality filter shape
    (hashing trick, Weinberger et al. 2009; the filter family behind
    CCNet / FineWeb-style "model score > threshold" corpus pruning) —
    in EXACT integer arithmetic so the score is engine-neutral and
    driver-hash-checkable.

    Per token: bucket b = md5_60("{tok}:q{seed}") % n_buckets, weight
    w10(b) = ((b*37 + 11) % 21) - 10 (integer tenths in [-1.0, +1.0]).
    Per document: logit10 = Σ w10 (exact long), score = logit10/(10·n)
    (ONE IEEE division — bit-identical everywhere), keep = logit10 > 0.

    The weight table is a deterministic stand-in for trained
    coefficients — swapping in a real model is a literal-map change —
    while the Spark-side plumbing is exactly what serving a trained
    linear filter at 100 TB needs: pure codegen projection (hash →
    bucket → weight → fold), no Python on the row path, no shuffle
    until the caller aggregates.

    Mirrors the reference's attribute-scoring UDF surface
    (demo_offline/04_query/03_query_vc.py's per-row verdict columns)
    re-expressed as whole-stage-codegen expressions."""
    words = _words(text_col)

    def w10(tok: Column) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(tok, F.lit(f":q{seed}"))), 1, 15),
            16,
            10,
        ).cast("long")
        b = F.pmod(h, F.lit(n_buckets))
        return F.pmod(b * F.lit(37) + F.lit(11), F.lit(21)) - F.lit(10)

    # stage the weight array behind a projection boundary (lambda-CSE:
    # Spark eliminates no common subexpression containing a lambda, and
    # z10 + n both reference it)
    staged = df.withColumn("__w10", F.transform(words, w10))
    z10 = F.aggregate(
        F.col("__w10"), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n = F.size(F.col("__w10")).cast("long")
    out = staged.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        n.alias("n_tokens"),
        z10.alias("logit10"),
    )
    score = F.when(
        F.col("n_tokens") > 0,
        F.round(
            F.col("logit10").cast("double")
            / (F.lit(10.0) * F.col("n_tokens").cast("double")),
            9,
        ),
    )
    return out.select(
        id_col,
        *carry_cols,
        "n_tokens",
        "logit10",
        score.alias("score"),
        (F.col("logit10") > 0).alias("keep"),
    )


#: Distinct-word vocabulary size up to which BPE training runs its
#: sequential merge rounds in the driver over the collected (word,
#: count) table instead of as n_merges distributed jobs — the
#: traversal-family COLLECT_THRESHOLD pattern (a few MB of strings;
#: the rounds are sequential either way, the driver path just skips
#: the per-round job floor).  Larger vocabularies use the distributed
#: loop unchanged.
BPE_DRIVER_VOCAB_THRESHOLD = 200_000


def bpe_train_list(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> list:
    """Iterative distributed BPE vocabulary training (Sennrich et al.
    2016, arXiv:1508.07909): ``n_merges`` rounds of [count adjacent
    symbol pairs corpus-wide → pick the most frequent → merge every
    occurrence], the loop ``bpe_merge_pairs`` is one superstep of.

    Symbol encoding keeps every round in plain string algebra: merge
    ``r`` mints the single private-use character chr(0xE000+r-1), so a
    word is always a string of 1-char symbols — adjacent-pair extraction
    stays the 2-char-substr kernel and applying a merge is ONE
    ``replace(word, pair, symbol)`` (left-to-right non-overlapping in
    the JVM, DuckDB and Python alike — exactly the trainer's
    simultaneous-merge semantics).  Corpus text must not contain
    private-use codepoints (asserted nowhere: a real deployment would
    escape them on ingest).

    Returns (rank, pair, pair_count) for the merges found, in rank
    order; stops early if a round finds no pair.  Distribution shape
    (the classic trainer optimization): the corpus collapses ONCE to
    the distinct-word VOCABULARY with occurrence counts
    (one shuffle, then localCheckpoint), and every round scans |vocab|
    rows — not |corpus| tokens — weighting each word's pairs by its
    count.  At 100 TB the token stream is the corpus but the vocabulary
    is ~millions of rows: rounds cost O(|vocab|), the whole train is
    one corpus pass + n_merges vocab passes.  Per round: one
    map-side-combined weighted count (key space ≤ (alphabet+r)², a few
    KB crossing the shuffle) plus a 1-row argmax collect — the
    kmeans_centroids driver-loop contract.  Re-encoding stacks
    ``replace`` expressions lazily; round r re-applies r-1 cheap
    codegen replaces rather than materializing the vocab per round.
    Measured at sf0.1 (6 merges, local[32]): 3.3 s on the token stream
    → see PERF.md for the vocab-path number."""
    vocab = (
        df.select(F.explode(_bpe_words(text_col)).alias("__word"))
        .groupBy("__word")
        .agg(F.count(F.lit(1)).cast("long").alias("__wc"))
        .localCheckpoint()
    )

    # r12 optimization (guide §1.2 — remove unnecessary passes): each
    # distributed round is a full job (scan vocab → explode pairs → agg
    # → collect top-1), and the rounds are SEQUENTIAL by nature, so
    # n_merges × the ~0.2 s job floor dominates training wall on any
    # vocab that is not huge.  When the vocabulary fits the driver
    # (the traversal-family COLLECT_THRESHOLD pattern; a BPE vocab is
    # |distinct words|, not corpus-sized) run the SAME algorithm in
    # pure Python over the collected (word, count) rows: identical pair
    # counting (weighted, len>=2 words), identical (count DESC, pair
    # ASC) argmax, and str.replace == F.replace (both left-to-right
    # non-overlapping), so the merge list is bit-identical — pinned by
    # test_bpe_driver_path_matches_distributed.  Vocabs past the
    # threshold keep the distributed loop unchanged.
    # r13 (ADVICE r12): gate the path choice with a COUNT of the
    # already-materialized (localCheckpointed) vocab instead of
    # collecting up to 200,001 rows only to discard them when the vocab
    # is over the threshold — an over-threshold corpus now pays a block
    # scan, not a 200k-row driver transfer.
    if vocab.count() <= BPE_DRIVER_VOCAB_THRESHOLD:
        rows = vocab.collect()
        words = [(r["__word"], int(r["__wc"])) for r in rows]
        found_local: list[tuple[int, str, int]] = []
        for r in range(1, n_merges + 1):
            counts: dict[str, int] = {}
            for w_, c_ in words:
                for i in range(len(w_) - 1):
                    p = w_[i : i + 2]
                    counts[p] = counts.get(p, 0) + c_
            if not counts:
                break
            pair = min(counts, key=lambda p: (-counts[p], p))
            found_local.append((r, pair, counts[pair]))
            sym = chr(0xE000 + r - 1)
            words = [(w_.replace(pair, sym), c_) for w_, c_ in words]
        return found_local

    encoded = F.col("__word")
    found: list[tuple[int, str, int]] = []
    for r in range(1, n_merges + 1):
        staged = vocab.select(encoded.alias("__enc"), F.col("__wc"))
        word = F.col("__enc")
        pairs = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(word) - 1, F.lit(0))),
            lambda i: word.substr(i, F.lit(2)),
        )
        top = (
            staged.filter(F.length(word) >= 2)
            .select(F.explode(pairs).alias("pair"), F.col("__wc"))
            .groupBy("pair")
            .agg(F.sum("__wc").cast("long").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, count = top[0]["pair"], int(top[0]["pair_count"])
        found.append((r, pair, count))
        encoded = F.replace(
            encoded, F.lit(pair), F.lit(chr(0xE000 + r - 1))
        )

    return found


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """`bpe_train_list` as a DataFrame (rank, pair, pair_count)."""
    from graphdb_for_drones_spark.traversal import _local_df

    return _local_df(
        df.sparkSession,
        bpe_train_list(df, n_merges, text_col),
        "rank int, pair string, pair_count long",
    )


def bpe_segment_stats(
    df: DataFrame,
    merges: list,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Tokenizer fertility/compression diagnostic: segment the corpus
    with a learned BPE merge table (rank-order simultaneous-replace
    application — the training-time segmentation, so `bpe_train_list`'s
    own corpus statistics are exactly reproduced) and roll up per
    ``group_col``: word count, raw character count, BPE symbol count
    and symbols-per-char compression.  Because every merge minted a
    1-char private-use symbol, the symbol count after segmentation is
    just the encoded word's LENGTH — the whole pass is one stacked
    chain of ``replace`` calls, pure codegen, one scan + a bounded
    rollup shuffle."""
    w = df.select(
        F.col(group_col), F.explode(_bpe_words(text_col)).alias("__word")
    )
    encoded = F.col("__word")
    for r, pair, _count in merges:
        encoded = F.replace(encoded, F.lit(pair), F.lit(chr(0xE000 + r - 1)))
    staged = w.select(
        F.col(group_col),
        F.length("__word").cast("long").alias("__chars"),
        F.length(encoded).cast("long").alias("__syms"),
    )
    ratio = F.when(
        F.sum("__chars") > 0,
        F.round(
            F.sum("__syms").cast("double") / F.sum("__chars").cast("double"),
            9,
        ),
    )
    return staged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("__chars").alias("n_chars"),
        F.sum("__syms").alias("n_symbols"),
        ratio.alias("compression"),
    )


def doc_frequency_topk(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus stopword induction: the top-``k`` words by DOCUMENT
    frequency with their corpus fraction — the df table that the
    engine's hot-shingle caps (contamination ``max_df``, the capped
    jaccard index) prune against, surfaced as its own report.  A
    corpus-specific stopword list beats a fixed one for quality
    scoring and df-capping on domain corpora.

    Plan: per-document distinct words (``array_distinct`` BEFORE the
    explode — map-side dedup, the exploded stream carries each
    (doc, word) once), one count-per-word aggregate (bounded by |vocab|
    after map-side combine), a TakeOrdered top-k, then the one-row
    corpus size binds via crossJoin(broadcast(...)) onto the k rows —
    the catalog's standard scalar-bind shape (constant cost, whitelisted
    NLJ).  All exact integers + one IEEE division."""
    words = F.array_distinct(_words(text_col))
    dfreq = (
        df.select(F.explode(words).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("word").asc())
        .limit(k)
    )
    nd = df.agg(F.count(F.lit(1)).alias("__nd"))
    return dfreq.crossJoin(F.broadcast(nd)).select(
        "word",
        "df",
        F.round(
            F.col("df").cast("double") / F.col("__nd").cast("double"), 9
        ).alias("df_frac"),
    )
