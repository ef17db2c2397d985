"""Deterministic hash splits: stability, coverage, ratio sanity."""

from pyspark.sql import functions as F

from graphdb_for_drones_spark.operators.split import (
    hash_split,
    stratified_counts,
)


def _docs(spark, n=2000):
    return spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(n)],
        "doc_id long, lang string",
    ).localCheckpoint()


def test_split_total_coverage_and_ratios(spark):
    df = _docs(spark)
    out = hash_split(df, "doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # every row gets exactly one split
    assert set(counts) == {"train", "val", "test"}
    # hash split is ratio-accurate in expectation; generous envelope
    assert 0.75 <= counts["train"] / 2000 <= 0.85
    assert 0.06 <= counts["val"] / 2000 <= 0.14
    assert 0.06 <= counts["test"] / 2000 <= 0.14


def test_split_stable_under_repartition_and_rerun(spark):
    df = _docs(spark, 500)
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(17), "doc_id").collect()
    }
    assert a == b  # pure function of the key: no leakage across reruns


def test_split_seed_changes_assignment(spark):
    df = _docs(spark, 500)
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id", seed=1).collect()}
    b = {r.doc_id: r.split for r in hash_split(df, "doc_id", seed=2).collect()}
    assert a != b


def test_stratified_counts_shape(spark):
    df = _docs(spark, 900)
    rows = stratified_counts(df, "doc_id", "lang").collect()
    per_stratum = {}
    for r in rows:
        per_stratum.setdefault(r.stratum, 0)
        per_stratum[r.stratum] += r.n_rows
    assert per_stratum == {"en": 600, "de": 300}


def test_split_partitioned_write_prunes(spark, tmp_path):
    # the split column is the partition column: reading one split is a
    # directory-pruned scan (never lists the other splits' files)
    from graphdb_for_drones_spark.sources.io import write_partitioned

    df = _docs(spark, 300)
    out = str(tmp_path / "corpus")
    write_partitioned(hash_split(df, "doc_id"), out, ["split"])
    back = spark.read.parquet(out)
    train = back.filter(F.col("split") == "train")
    plan = train._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan and "split" in plan
    # pruned read returns exactly the train rows
    expected = {
        r.doc_id
        for r in hash_split(df, "doc_id").filter(F.col("split") == "train").collect()
    }
    assert {r.doc_id for r in train.collect()} == expected


def test_negative_pairs_contract(spark):
    from graphdb_for_drones_spark.operators.split import negative_pairs

    ids = spark.createDataFrame(
        [(i,) for i in range(50)], "doc_id long"
    ).localCheckpoint()
    out = negative_pairs(ids, "doc_id", k=3).collect()
    assert len(out) == 150  # exactly k per id
    assert all(r.doc_id != r.neg_doc_id for r in out)  # never self
    # deterministic across invocations
    again = negative_pairs(ids, "doc_id", k=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # seed changes the draw
    other = negative_pairs(ids, "doc_id", k=3, seed=7).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_negative_pairs_excludes_positives(spark):
    from graphdb_for_drones_spark.operators.split import negative_pairs

    ids = spark.createDataFrame(
        [(i,) for i in range(20)], "doc_id long"
    ).localCheckpoint()
    base = negative_pairs(ids, "doc_id", k=2).collect()
    # declare every sampled pair a known positive: all must be excluded
    pos = spark.createDataFrame(
        [(r.doc_id, r.neg_doc_id) for r in base], "a long, b long"
    )
    filtered = negative_pairs(ids, "doc_id", k=2, positives=pos).collect()
    assert filtered == []


def test_stratified_sample_k_per_group_deterministic(spark):
    from graphdb_for_drones_spark.operators.split import stratified_sample

    df = _docs(spark)
    out = stratified_sample(df, "lang", "doc_id", k=7).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append((r.sample_rank, r.doc_id))
    assert set(by_lang) == {"en", "de"}
    for lang, rows in by_lang.items():
        assert sorted(r[0] for r in rows) == list(range(1, 8))
    # rerun + repartition → identical membership AND ranks
    again = stratified_sample(df.repartition(32), "lang", "doc_id", k=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_stratified_sample_two_stage_equals_single_window(spark):
    # the bucketed composition must equal the naive one-window answer
    from pyspark.sql.window import Window

    from graphdb_for_drones_spark.operators.split import (
        _md5_60bit,
        stratified_sample,
    )

    df = _docs(spark, n=500)
    h = _md5_60bit(F.concat(F.col("doc_id").cast("string"), F.lit(":gs42")))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    naive = (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= 3)
        .select("lang", "doc_id", "sample_rank")
        .collect()
    )
    fast = stratified_sample(df, "lang", "doc_id", k=3).collect()
    assert sorted(map(tuple, naive)) == sorted(map(tuple, fast))


def test_stratified_sample_small_group_returns_whole_group(spark):
    from graphdb_for_drones_spark.operators.split import stratified_sample

    df = spark.createDataFrame(
        [(1, "solo"), (2, "solo"), (3, "big"), (4, "big"), (5, "big")],
        "doc_id long, lang string",
    ).localCheckpoint()
    out = stratified_sample(df, "lang", "doc_id", k=10).collect()
    assert len([r for r in out if r.lang == "solo"]) == 2
    assert len([r for r in out if r.lang == "big"]) == 3


def test_weighted_sample_prefers_heavy_keys_statistically(spark):
    from graphdb_for_drones_spark.operators.split import weighted_sample_topk

    # 100 light (w=1) + 10 heavy (w=100) rows: heavy rows carry ~91% of
    # total weight, so a 20-draw E-S sample must be heavy-dominated
    rows = [(i, 1) for i in range(100)] + [(1000 + i, 100) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, w long").localCheckpoint()
    got = weighted_sample_topk(df, "w", k=20).collect()
    heavy = sum(1 for r in got if r.doc_id >= 1000)
    assert heavy >= 8  # all 10 heavy rows near-certainly in the top-20
    # deterministic: identical on rerun and under repartition
    again = weighted_sample_topk(df.repartition(7), "w", k=20).collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in again]


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from graphdb_for_drones_spark.operators.split import weighted_sample_topk

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 7)], "doc_id long, w long"
    ).localCheckpoint()
    got = weighted_sample_topk(df, "w", k=10).collect()
    assert [r.doc_id for r in got] == [3]
