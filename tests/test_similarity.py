"""Similarity search: exact brute-force vs numpy ground truth, ANN
self-consistency."""

import os
import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, IntegerType, StructField, StructType

from graphdb_for_drones_spark.operators.similarity import (
    ann_index,
    ann_search,
    cosine_pairs_blocked,
    cosine_topk,
)

DIM = 16
N = 60


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(N, DIM).astype(np.float32)
    # plant a known near-duplicate of vector 0
    vecs[1] = vecs[0] + rng.randn(DIM).astype(np.float32) * 0.01
    schema = StructType(
        [
            StructField("vec_id", IntegerType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    rows = [(i, [float(x) for x in vecs[i]], i % 3) for i in range(N)]
    df = spark.createDataFrame(rows, schema).coalesce(1).localCheckpoint()
    return df, vecs


def np_cosine(a, b):
    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    return float(a64 @ b64 / (np.linalg.norm(a64) * np.linalg.norm(b64)))


def test_brute_force_matches_numpy(vectors):
    df, vecs = vectors
    q = [float(x) for x in vecs[0]]
    got = cosine_topk(df.filter(F.col("vec_id") != 0), q, k=5).collect()
    exp = sorted(
        ((i, round(np_cosine(vecs[i], vecs[0]), 6)) for i in range(1, N)),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r.vec_id, r.cosine) for r in got] == exp
    assert got[0].vec_id == 1  # the planted near-dup wins


def test_ann_finds_planted_neighbor(vectors):
    df, vecs = vectors
    q = [float(x) for x in vecs[0]]
    idx = ann_index(df, dim=DIM)
    res = ann_search(idx, q, k=3)
    ids = [r.vec_id for r in res.collect()]
    # vec 0 itself collides in all bands (cos=1), planted dup in nearly all
    assert ids[0] == 0
    assert 1 in ids


def test_blocked_pairs(vectors):
    df, vecs = vectors
    # ids 0 and 1 share label 0 mod 3? 0%3=0, 1%3=1 → different labels.
    # use a constant block to check pair math, threshold high to keep small
    pairs = cosine_pairs_blocked(
        df.withColumn("blk", F.lit(1)), "blk", threshold=0.95
    ).collect()
    got = {(r.id_a, r.id_b): r.cosine for r in pairs}
    assert (0, 1) in got
    assert got[(0, 1)] == round(np_cosine(vecs[0], vecs[1]), 6)


def test_blocked_pairs_adaptive_lsh_leg(vectors):
    # force the over-cap LSH leg (max_block_rows below the block size):
    # results must be a subset of the exact leg with IDENTICAL rounded
    # scores, and the planted near-dup (cos ≈ 0.9998 → band collision
    # probability ≈ 1-3e-7) must survive the routing
    df, vecs = vectors
    blocked = df.withColumn("blk", F.lit(1))
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs_blocked(blocked, "blk", threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs_blocked(
            blocked, "blk", threshold=0.5, max_block_rows=10, dim=DIM
        ).collect()
    }
    assert (0, 1) in lsh
    assert lsh[(0, 1)] == exact[(0, 1)]
    assert set(lsh) <= set(exact)
    assert all(exact[p] == c for p, c in lsh.items())


def test_blocked_pairs_mixed_blocks_and_exact_dup_recall(spark):
    # one under-cap block (exact leg: every qualifying pair present) and
    # one over-cap block holding an exact duplicate (identical vectors
    # collide in every band → recall 1.0 by construction)
    import random

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)], "small") for i in range(4)]
    rows += [(100 + i, [rng.uniform(-1, 1) for _ in range(16)], "big") for i in range(20)]
    rows.append((200, list(rows[4][1]), "big"))  # exact dup of vec 100
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).localCheckpoint()
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs_blocked(
            emb, "label", threshold=0.99, max_block_rows=10, dim=16
        ).collect()
    }
    assert got[(100, 200)] == 1.0
    # the small block went through the exact leg: brute-force agreement
    import itertools

    for a, b in itertools.combinations(range(4), 2):
        va = np.array(rows[a][1])
        vb = np.array(rows[b][1])
        c = round(np_cosine(va, vb), 6)
        assert ((a, b) in got) == (c >= 0.99)


def test_ivf_self_query_top1(spark):
    from graphdb_for_drones_spark.operators.similarity import (
        ivf_index,
        ivf_search,
    )

    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.9, 0.1, 0.0]),
        (4, [0.0, 0.9, 0.2]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    centroids = [(1, vecs[0][1]), (2, vecs[1][1])]
    idx = ivf_index(df, centroids)
    clusters = {r.vec_id: r.cluster for r in idx.collect()}
    assert clusters == {1: 1, 2: 2, 3: 1, 4: 2}
    # query near centroid 1 with n_probe=1 only sees cluster 1
    hits = ivf_search(idx, centroids, [1.0, 0.05, 0.0], k=2, n_probe=1).collect()
    assert [r.vec_id for r in hits] == [3, 1] or [r.vec_id for r in hits] == [1, 3]
    assert all(r.cosine > 0.9 for r in hits)


def test_ann_near_pairs_exact_dup_recall(spark):
    # identical vectors share every band bucket → recall 1.0 for exact
    # dups by construction; cosine of the planted pair is exactly 1.0
    import random

    from graphdb_for_drones_spark.operators.similarity import ann_near_pairs

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(30)
    ]
    rows.append((100, list(rows[0][1])))  # exact duplicate of vec 0
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in ann_near_pairs(emb, dim=64, threshold=0.9).collect()
    }
    assert got[(0, 100)] == 1.0
    # every returned pair respects the verification threshold
    assert all(c >= 0.9 for c in got.values())


def test_kmeans_separates_planted_clusters(spark):
    # two far-apart blobs: 2-means must put each blob in one cluster,
    # regardless of which sampled vectors seed the init
    import random

    from graphdb_for_drones_spark.operators.similarity import (
        ivf_index,
        kmeans_centroids,
    )

    rng = random.Random(5)
    rows = []
    for i in range(25):  # blob A: near +e1
        rows.append((i, [1.0 + rng.uniform(-0.05, 0.05)] + [rng.uniform(-0.05, 0.05)] * 63))
    for i in range(25, 50):  # blob B: near -e1
        rows.append((i, [-1.0 + rng.uniform(-0.05, 0.05)] + [rng.uniform(-0.05, 0.05)] * 63))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).localCheckpoint()
    cents = kmeans_centroids(emb, k=2, iters=2, seed=7)
    assert len(cents) == 2
    asg = {r.vec_id: r.cluster for r in ivf_index(emb, cents).collect()}
    blob_a = {asg[i] for i in range(25)}
    blob_b = {asg[i] for i in range(25, 50)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b

    # determinism: same seed → identical centroids
    again = kmeans_centroids(emb, k=2, iters=2, seed=7)
    assert again == cents


def test_ivf_persisted_index_roundtrip(spark, tmp_path, monkeypatch):
    # build-once/probe-many lifecycle: ivf_open persists the index
    # (parquet partitioned by cluster + centroids.json) and a second open
    # must NOT rerun k-means; the persisted probe matches the fresh plan
    # and its scan is partition-pruned to the probed clusters.
    import random

    import graphdb_for_drones_spark.operators.similarity as sim

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    path = str(tmp_path / "ivf-test")

    idx1, cents1 = sim.ivf_open(spark, emb, path, k=4, iters=1, seed=3)
    q = rows[5][1]
    fresh = sim.ivf_index(emb, cents1)
    expect = sim.ivf_search(fresh, cents1, q, k=5, n_probe=2).collect()
    got1 = sim.ivf_search(idx1, cents1, q, k=5, n_probe=2).collect()
    assert got1 == expect

    # second open: loads from disk — fail loudly if it tries to rebuild
    def _boom(*a, **kw):  # pragma: no cover - the assertion is the point
        raise AssertionError("k-means re-ran on a warm ivf_open")

    monkeypatch.setattr(sim, "kmeans_centroids", _boom)
    idx2, cents2 = sim.ivf_open(spark, emb, path, k=4, iters=1, seed=3)
    assert cents2 == cents1
    assert sim.ivf_search(idx2, cents2, q, k=5, n_probe=2).collect() == expect

    probe = idx2.filter(idx2.cluster.isin([int(cents1[0][0])]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan


def test_pq_encode_codes_valid_and_deterministic(vectors):
    from graphdb_for_drones_spark.operators import similarity as sim

    df, _ = vectors
    books = sim.pq_codebooks(df, m=4, ksub=8, seed=5)
    assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
    codes = sim.pq_encode(df, books).collect()
    assert len(codes) == N
    for r in codes:
        for j in range(4):
            assert 0 <= r[f"code_{j}"] < 8
    # partitioning must not change a single code (pure projection)
    again = sim.pq_encode(df.repartition(16), books).collect()
    assert sorted(map(tuple, codes)) == sorted(map(tuple, again))


def test_pq_sampled_vector_encodes_to_itself(vectors):
    # a vector that IS sample c has squared distance exactly 0 to its
    # own subvectors, so every subspace code points at it (or an exact
    # duplicate earlier in codeword order)
    from graphdb_for_drones_spark.operators import similarity as sim

    df, _ = vectors
    books = sim.pq_codebooks(df, m=4, ksub=8, seed=5)
    rk = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":5")))
    sample = (
        df.select("vec_id", "embedding", rk.alias("rk"))
        .orderBy("rk", "vec_id")
        .limit(8)
        .collect()
    )
    codes = {
        r.vec_id: [r[f"code_{j}"] for j in range(4)]
        for r in sim.pq_encode(df, books).collect()
    }
    for c, row in enumerate(sample):
        got = codes[row.vec_id]
        for j in range(4):
            # distance 0 is the global min; first-index tiebreak may
            # pick an earlier codeword only if ALSO at distance 0
            assert books[j][got[j]] == [
                float(v) for v in row.embedding[j * 4 : (j + 1) * 4]
            ] or got[j] == c


def test_pq_adc_self_query_hits_itself(vectors):
    # querying WITH a sampled vector: its own code cells are all 0, so
    # its adist is exactly 0 and it ranks first (id tiebreak)
    from graphdb_for_drones_spark.operators import similarity as sim

    df, _ = vectors
    books = sim.pq_codebooks(df, m=4, ksub=8, seed=5)
    rk = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":5")))
    row0 = (
        df.select("vec_id", "embedding", rk.alias("rk"))
        .orderBy("rk", "vec_id")
        .first()
    )
    q = [float(v) for v in row0.embedding]
    top = sim.pq_adc_topk(df, q, books, k=3).collect()
    assert top[0].vec_id == row0.vec_id
    assert top[0].adist == 0


def test_pq_adc_orders_like_exact_l2_on_separated_data(spark):
    # 3 tight planted clusters around orthogonal axes: ADC must rank
    # the query's own cluster ahead of the others even with tiny
    # codebooks (inter-cluster distance >> quantization error)
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        StructField,
        StructType,
    )

    from graphdb_for_drones_spark.operators import similarity as sim

    rng = np.random.RandomState(11)
    rows = []
    for cl in range(3):
        base = np.zeros(8, dtype=np.float32)
        base[cl] = 10.0
        for i in range(12):
            v = base + rng.randn(8).astype(np.float32) * 0.05
            rows.append((cl * 100 + i, [float(x) for x in v], cl))
    schema = StructType(
        [
            StructField("vec_id", IntegerType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    df = spark.createDataFrame(rows, schema).localCheckpoint()
    books = sim.pq_codebooks(df, m=2, ksub=8, seed=7)
    q = rows[0][1]  # a cluster-0 member
    top = sim.pq_adc_topk(df, q, books, k=12).collect()
    assert all(r.vec_id < 100 for r in top), [r.vec_id for r in top]


def test_pq_rejects_bad_shapes(vectors):
    from graphdb_for_drones_spark.operators import similarity as sim

    df, _ = vectors
    with pytest.raises(ValueError):
        sim.pq_codebooks(df, m=5)  # 16 % 5 != 0
    books = sim.pq_codebooks(df, m=4, ksub=8)
    with pytest.raises(ValueError):
        sim.pq_adc_topk(df, [0.0] * 7, books)


def test_index_dir_hygiene_sweeps_tmp_and_stale_fingerprints(
    spark, tmp_path
):
    # Crash leftovers (<path>.tmp.<pid>, OLD ones only) and dead
    # fingerprints of THE SAME source (<params>-<sid>-<oldfp> after a
    # source rewrite) must not accumulate: a fresh build sweeps both.
    # Live state survives: a fresh tmp (concurrent builder mid-write),
    # another SOURCE's index under the same params, another params set,
    # and hand-named dirs.
    import random

    import graphdb_for_drones_spark.operators.similarity as sim

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()

    root = tmp_path / "indexes"
    root.mkdir()
    sid = "ab" * 4
    path = str(root / ("ivf-k4-i1-s3-" + sid + "-" + "ab" * 8))
    # plant: an OLD crash leftover, a FRESH tmp, a stale fingerprint of
    # the same source, a different source (other sid), another params
    # set, and a hand-named dir
    old_tmp = root / (os.path.basename(path) + ".tmp.999")
    old_tmp.mkdir()
    os.utime(old_tmp, (1_000_000_000, 1_000_000_000))
    fresh_tmp = root / (os.path.basename(path) + ".tmp.1000")
    fresh_tmp.mkdir()
    stale = root / ("ivf-k4-i1-s3-" + sid + "-" + "cd" * 8)
    stale.mkdir()
    (stale / "junk").write_text("x")
    os.utime(stale / "junk", (1_000_000_000, 1_000_000_000))
    os.utime(stale, (1_000_000_000, 1_000_000_000))
    # pre-source-id legacy name: dead once aged, must be swept
    legacy = root / ("ivf-k4-i1-s3-" + "ee" * 8)
    legacy.mkdir()
    os.utime(legacy, (1_000_000_000, 1_000_000_000))
    # a FRESH stale-fingerprint sibling may still be mid-read by a
    # pre-rewrite session — the age guard must keep it this build
    fresh_stale = root / ("ivf-k4-i1-s3-" + sid + "-" + "dd" * 8)
    fresh_stale.mkdir()
    # old tmp whose INNER file is fresh = a slow live builder mid-write;
    # the age guard keys off the newest mtime in the tree, so it survives
    slow_live = root / (os.path.basename(path) + ".tmp.1001")
    (slow_live / "index").mkdir(parents=True)
    os.utime(slow_live, (1_000_000_000, 1_000_000_000))
    (slow_live / "index" / "part-0").write_text("x")
    other_source = root / ("ivf-k4-i1-s3-" + "ef" * 4 + "-" + "cd" * 8)
    other_source.mkdir()
    other_params = root / ("ivf-k8-i1-s3-" + sid + "-" + "ef" * 8)
    other_params.mkdir()
    hand_named = root / "ivf-test"
    hand_named.mkdir()

    idx, cents = sim.ivf_open(spark, emb, path, k=4, iters=1, seed=3)
    assert idx.count() == 30 and len(cents) == 4
    entries = sorted(os.listdir(root))
    assert os.path.basename(path) in entries
    assert not any(e.endswith(".tmp.999") for e in entries), "old tmp kept"
    assert any(e.endswith(".tmp.1000") for e in entries), "fresh tmp swept"
    assert os.path.basename(str(stale)) not in entries, "stale fp kept"
    assert os.path.basename(str(legacy)) not in entries, "legacy dir kept"
    assert os.path.basename(str(fresh_stale)) in entries, "fresh stale swept under a possible reader"
    assert any(e.endswith(".tmp.1001") for e in entries), "slow live builder swept"
    assert os.path.basename(str(other_source)) in entries, "other source swept"
    assert os.path.basename(str(other_params)) in entries
    assert "ivf-test" in entries


def test_sql_fast_paths_accept_quoted_identifiers(spark):
    # the str-name SQL fast paths must handle column names that need
    # backtick quoting (dots/hyphens) identically to the Column path
    import graphdb_for_drones_spark.operators.dedup as dd
    import graphdb_for_drones_spark.operators.similarity as sim
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [3, 5, 9]), (2, [1, 2, 4])], "id long, h array<long>"
    ).withColumn("my.col-weird", F.col("h"))

    fast = df.select(
        F.col("id"), dd.simhash_from_hashes("my.col-weird").alias("s")
    )
    slow = df.select(
        F.col("id"), dd.simhash_from_hashes(F.col("`my.col-weird`")).alias("s")
    )
    assert fast.collect() == slow.collect()

    fast_md5 = df.select(
        dd.simhash_md5_from_hashes("my.col-weird").alias("s")
    ).collect()
    slow_md5 = df.select(
        dd.simhash_md5_from_hashes(F.col("`my.col-weird`")).alias("s")
    ).collect()
    assert fast_md5 == slow_md5

    vdf = spark.createDataFrame(
        [(1, [0.5, -0.25, 1.0])], "id long, v array<float>"
    ).withColumn("emb.dotted", F.col("v"))
    planes = sim.hyperplanes(3, n_planes=8, seed=2)
    sig_fast = vdf.select(
        sim.lsh_signature("emb.dotted", planes).alias("g")
    ).collect()
    sig_slow = vdf.select(
        sim.lsh_signature(F.col("`emb.dotted`"), planes).alias("g")
    ).collect()
    assert sig_fast == sig_slow


def test_near_pairs_open_persists_and_matches_fresh(spark, tmp_path, monkeypatch):
    # eps-graph lifecycle (the ivf_open pattern applied to ann_near_pairs):
    # first open builds + persists, second open is read-only, and the
    # persisted graph is bit-identical to a fresh enumeration.
    import random

    import graphdb_for_drones_spark.operators.similarity as sim

    rng = random.Random(5)
    base = [rng.uniform(-1, 1) for _ in range(8)]
    rows = [(i, [v + rng.uniform(-0.01, 0.01) for v in base]) for i in range(10)]
    rows += [(100 + i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    path = str(tmp_path / "npairs-test")

    fresh = sorted(
        tuple(r)
        for r in sim.ann_near_pairs(emb, dim=8, threshold=0.8).collect()
    )
    got1 = sorted(
        tuple(r)
        for r in sim.near_pairs_open(
            spark, emb, path, dim=8, threshold=0.8
        ).collect()
    )
    assert got1 == fresh and len(fresh) > 0

    def _boom(*a, **kw):  # pragma: no cover - the assertion is the point
        raise AssertionError("pair enumeration re-ran on a warm open")

    monkeypatch.setattr(sim, "ann_near_pairs", _boom)
    got2 = sorted(
        tuple(r)
        for r in sim.near_pairs_open(
            spark, emb, path, dim=8, threshold=0.8
        ).collect()
    )
    assert got2 == fresh


def test_ngram_pairs_open_persists_and_matches_fresh(spark, tmp_path, monkeypatch):
    import graphdb_for_drones_spark.operators.dedup as dd

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint()
    path = str(tmp_path / "ngpairs-test")

    fresh = sorted(
        tuple(r) for r in dd.ngram_jaccard_pairs(docs, threshold=0.1).collect()
    )
    got1 = sorted(
        tuple(r)
        for r in dd.ngram_pairs_open(spark, docs, path, threshold=0.1).collect()
    )
    assert got1 == fresh and len(fresh) > 0

    def _boom(*a, **kw):  # pragma: no cover - the assertion is the point
        raise AssertionError("pair enumeration re-ran on a warm open")

    monkeypatch.setattr(dd, "ngram_jaccard_pairs", _boom)
    got2 = sorted(
        tuple(r)
        for r in dd.ngram_pairs_open(spark, docs, path, threshold=0.1).collect()
    )
    assert got2 == fresh


def test_ivfpq_topk_equals_adc_over_probed_members(spark):
    """The IVFPQ composition must equal ADC ranking restricted to the
    coarse probe's member set — the two independently tested artifacts
    composed with no new approximation beyond the probe itself."""
    import random

    from graphdb_for_drones_spark.operators import similarity as sim

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(1, 60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    q = rows[4][1]

    cents = sim.kmeans_centroids(emb, k=4, iters=1, seed=7)
    idx = sim.ivf_index(emb, cents).localCheckpoint()
    books = sim.pq_codebooks(emb, m=4, ksub=8, seed=7)
    codes = sim.pq_encode(emb, books).localCheckpoint()

    got = sim.ivfpq_topk(idx, cents, codes, books, q, k=5, n_probe=2)
    got_rows = [(r.vec_id, r.adist) for r in got.collect()]

    # expected: ADC over exactly the probed clusters' members
    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) * float(x) for x in a) ** 0.5
        nb = sum(float(y) * float(y) for y in b) ** 0.5
        return round(d / (na * nb), 6)

    probes = [
        cid
        for _, cid in sorted(
            ((cos(q, v), -cid) for cid, v in cents), reverse=True
        )[:2]
    ]
    probes = [-c for c in probes]
    members = {
        r.vec_id for r in idx.collect() if r.cluster in probes
    }
    adc_all = sim.pq_adc_topk_from_codes(
        codes.filter(codes.vec_id.isin(list(members))), q, books, k=5
    )
    want_rows = [(r.vec_id, r.adist) for r in adc_all.collect()]
    assert got_rows == want_rows and len(got_rows) == 5
    # every result id really is a probed-cluster member
    assert {i for i, _ in got_rows} <= members


def test_ann_near_pairs_auto_band_width(spark):
    """n_planes=None sizes the bucket space to the corpus: small inputs
    keep the 4-bit default; the width grows ~log2(n) past the target
    bucket size (the sf1 saturation knee, fixed by default)."""
    from graphdb_for_drones_spark.operators import similarity as sim

    assert sim.auto_band_width(100) == 4
    assert sim.auto_band_width(2_000) == 4
    assert sim.auto_band_width(20_000) == 8
    assert sim.auto_band_width(1_000_000) == 13
    assert sim.auto_band_width(0) == 4

    import random

    rng = random.Random(2)
    base = [rng.uniform(-1, 1) for _ in range(8)]
    rows = [(i, [v + rng.uniform(-0.005, 0.005) for v in base]) for i in range(6)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    # auto on a tiny corpus == the explicit 16/4 default (width 4)
    auto = sorted(
        tuple(r)
        for r in sim.ann_near_pairs(
            emb, dim=8, threshold=0.9, n_planes=None
        ).collect()
    )
    fixed = sorted(
        tuple(r)
        for r in sim.ann_near_pairs(
            emb, dim=8, threshold=0.9, n_planes=16
        ).collect()
    )
    assert auto == fixed and len(auto) > 0


def test_ivfpq_residual_matches_python_reference(spark):
    """Residual IVFPQ end-to-end vs a straight-line python reference:
    same centroids, same residuals, same seeded codebook sample, same
    integer micro-unit ADC — the engine's distributed composition must
    reproduce it row for row."""
    import hashlib
    import math
    import random

    from graphdb_for_drones_spark.operators import similarity as sim

    rng = random.Random(13)
    dim, m, ksub = 16, 4, 8
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(1, 50)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    q = rows[7][1]

    cents = sim.kmeans_centroids(emb, k=3, iters=1, seed=5)
    codes, books = sim.ivfpq_residual_build(
        emb, cents, m=m, ksub=ksub, seed=5
    )
    got = [
        (r.vec_id, r.adist)
        for r in sim.ivfpq_residual_search(
            codes, cents, books, q, k=5, n_probe=2
        ).collect()
    ]

    # ---- python reference ------------------------------------------------
    vecs = {i: [float(x) for x in spark.createDataFrame(
        [(i, v)], "vec_id long, embedding array<float>"
    ).first().embedding] for i, v in rows}  # float32 round-trip like the engine

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b))
            ),
            6,
        )

    # assignment: best cosine, centroid-id tiebreak (ivf_index rule)
    asg = {}
    for i, v in vecs.items():
        best = max(((cos(v, cv), -cid) for cid, cv in cents))
        asg[i] = -best[1]
    cent = {cid: cv for cid, cv in cents}
    resid = {i: [x - c for x, c in zip(v, cent[asg[i]])] for i, v in vecs.items()}

    # codebooks: ksub smallest md5(f"{id}:5"), id tiebreak
    sample = sorted(
        vecs, key=lambda i: (hashlib.md5(f"{i}:5".encode()).hexdigest(), i)
    )[:ksub]
    dsub = dim // m
    books_ref = [
        [resid[i][j * dsub : (j + 1) * dsub] for i in sample]
        for j in range(m)
    ]
    for j in range(m):
        assert [
            [round(x, 9) for x in cw] for cw in books[j]
        ] == [[round(x, 9) for x in cw] for cw in books_ref[j]]

    def micro(x):
        return int(math.floor(x * 1_000_000.0 + 0.5))

    def encode(r):
        out = []
        for j in range(m):
            ds = []
            for c, cw in enumerate(books_ref[j]):
                acc = 0.0
                for i2 in range(dsub):
                    d = r[j * dsub + i2] - cw[i2]
                    acc += d * d
                ds.append((micro(acc), c))
            out.append(min(ds)[1])
        return out

    probes = [-p for _, p in sorted(
        ((cos(q, cv), -cid) for cid, cv in cents), reverse=True
    )[:2]]
    qf = vecs[8]  # float32-rounded query (rows[7] has vec_id 8)
    cand = []
    for i in vecs:
        if asg[i] not in probes:
            continue
        qres = [x - c for x, c in zip(qf, cent[asg[i]])]
        code = encode(resid[i])
        adist = 0
        for j in range(m):
            cw = books_ref[j][code[j]]
            acc = 0.0
            for i2 in range(dsub):
                d = qres[j * dsub + i2] - cw[i2]
                acc += d * d
            adist += micro(acc)
        cand.append((adist, i))
    want = [(i, a) for a, i in sorted(cand)[:5]]
    assert got == want


def test_auto_band_width_integer_equals_float_form():
    """The integer form ((ceil(n/t)−1).bit_length(), ulp-proof) must
    equal the float ceil(log2(n/t)) everywhere, including the
    power-of-two boundaries where a one-ulp log2 error would flip the
    geometry."""
    import math

    from graphdb_for_drones_spark.operators import similarity as sim

    ns = list(range(1, 4097))
    for k in range(3, 32):
        ns += [128 * (1 << k) - 1, 128 * (1 << k), 128 * (1 << k) + 1]
    for n in ns:
        want = max(4, math.ceil(math.log2(max(1.0, n / 128))))
        assert sim.auto_band_width(n) == want, n


def test_ann_near_pairs_auto_oracle_width_matches_engine():
    """The ann_near_pairs_auto ORACLE derives the band width from
    COUNT(*) in SQL; it must agree with ``auto_band_width`` for every
    corpus size, else the whole inlined-plane geometry diverges."""
    import duckdb

    from graphdb_for_drones_spark.operators import similarity as sim

    geom = """
    SELECT GREATEST(4, MIN(w)) AS width
    FROM range(0, 40) t(w)
    WHERE (CAST(1 AS BIGINT) << CAST(w AS INT)) >= ({n} + 127) // 128
    """
    for n in [1, 100, 127, 128, 129, 2000, 2048, 2049, 16384, 16385,
              20_000, 131072, 131073, 1_000_000]:
        got = duckdb.sql(geom.format(n=n)).fetchone()[0]
        assert got == sim.auto_band_width(n), n


def test_ann_near_pairs_auto_widens_and_verifies_on_bigger_corpus(spark):
    """Past the 128-per-bucket target the auto path must pick a WIDER
    band than the fixed default (the sf1 knee) while still returning
    exactly the LSH-candidates-verified-by-cosine of the explicit
    geometry it chose."""
    import random

    from graphdb_for_drones_spark.operators import similarity as sim

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(3000)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    width = sim.auto_band_width(3000)
    assert width == 5  # wider than the fixed 4-bit default
    auto = sorted(
        tuple(r)
        for r in sim.ann_near_pairs(
            emb, dim=8, threshold=0.5, n_planes=None
        ).collect()
    )
    explicit = sorted(
        tuple(r)
        for r in sim.ann_near_pairs(
            emb, dim=8, threshold=0.5, n_planes=width * 4
        ).collect()
    )
    assert auto == explicit and len(auto) > 0


def test_sq8_topk_reconstruction_and_constant_dim(spark):
    """SQ8: an exact duplicate of the query must score (near) 1.0 and
    rank first; a CONSTANT dimension (span 0) decodes to lo instead of
    dividing by zero; 8-bit reconstruction keeps the approximate
    ranking close to exact brute force on well-separated vectors."""
    import random

    from graphdb_for_drones_spark.operators import similarity as sim

    rng = random.Random(11)
    base = [rng.uniform(-1, 1) for _ in range(7)] + [3.0]  # dim 7 const
    rows = [(0, base)]
    rows += [
        (i, [rng.uniform(-1, 1) for _ in range(7)] + [3.0])
        for i in range(1, 40)
    ]
    rows.append((99, list(base)))  # exact duplicate of the query
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint()
    q = [float(x) for x in base]
    got = sim.sq8_topk(
        emb.filter("vec_id <> 0"), q, k=5,
        bounds=sim.sq8_bounds(emb, dim=8),
    ).collect()
    assert got[0].vec_id == 99
    assert got[0].cosine >= 0.9999  # 8-bit decode of itself
    exact_top = [
        r.vec_id
        for r in sim.cosine_topk(emb.filter("vec_id <> 0"), q, k=5).collect()
    ]
    approx_top = [r.vec_id for r in got]
    assert len(set(exact_top) & set(approx_top)) >= 4  # recall@5 >= 0.8
