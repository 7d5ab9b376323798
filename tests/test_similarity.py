"""Similarity-search operator tests (cosine_topk exact; LSH recall)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_efo_spark.operators.similarity import cosine_topk, lsh_cosine_topk


def _vec(*xs):
    return [float(x) for x in xs]


def test_cosine_topk_exact(spark):
    rows = [
        (1, _vec(1, 0, 0, 0)),
        (2, _vec(0.9, 0.1, 0, 0)),
        (3, _vec(0, 1, 0, 0)),
        (4, _vec(-1, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = cosine_topk(df, df, "vec_id", "vec_id", k=2)
    got = {
        (r.vec_id, r.rank): (r.neighbor_id, r.score) for r in out.collect()
    }
    assert got[(1, 1)][0] == 2  # closest to e_x is the 0.9/0.1 vector
    assert math.isclose(got[(1, 1)][1], 0.9 / math.sqrt(0.81 + 0.01), rel_tol=1e-9)
    assert got[(1, 2)][0] == 3  # orthogonal beats antipodal
    assert got[(4, 2)][0] in (2, 3)


def test_lsh_recall_on_identical_vectors(spark):
    """Identical vectors share every band bucket → always candidates."""
    rows = [(i, _vec(*(1.0 if j == i else 0.1 for j in range(8)))) for i in range(4)]
    rows.append((100, rows[0][1]))  # exact dup of vec 0
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = lsh_cosine_topk(df, "vec_id", "embedding", dim=8, k=3)
    top = {r.vec_id: r.neighbor_id for r in out.collect() if r.rank == 1}
    assert top[0] == 100 and top[100] == 0


def test_embedding_near_dup_lsh_matches_exhaustive(spark):
    """On a clustered corpus (true near-dups, cosine >= ~0.95) the LSH
    candidate path finds the same pairs as the exhaustive cross join."""
    import random

    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(10):
        base = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(3):  # 3 near-identical members per cluster
            rows.append((vid, [x + rng.gauss(0, 0.02) for x in base]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    from flink_efo_spark.operators.similarity import embedding_near_duplicates

    lsh = embedding_near_duplicates(
        df, "vec_id", "embedding", threshold=0.9, dim=64
    )
    exact = embedding_near_duplicates(
        df, "vec_id", "embedding", threshold=0.9, dim=64, exhaustive=True
    )
    got = {(r.id_a, r.id_b) for r in lsh.collect()}
    exp = {(r.id_a, r.id_b) for r in exact.collect()}
    # 10 clusters x 3 choose 2 = 30 within-cluster pairs
    assert exp == got
    assert len(exp) == 30


def test_ivf_topk_recall_on_clustered_corpus(spark):
    """IVF with enough probes finds the exact top-k on a clustered
    corpus: cluster members share a cell (their mutual cosine is far
    above cross-cluster), so probing the query's own top cells covers
    the true neighbors."""
    import random

    rng = random.Random(11)
    rows = []
    vid = 0
    for c in range(8):
        base = [rng.gauss(0, 1) for _ in range(64)]
        for _ in range(6):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in base]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    from flink_efo_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    q = df.where(F.col("vec_id") % 6 == 0)  # one query per cluster
    exact = cosine_topk(q, df, "vec_id", "vec_id", "embedding", k=3)
    ivf = ivf_cosine_topk(
        q, df, "vec_id", "vec_id", "embedding", k=3, n_cells=8, nprobe=2
    )
    truth = {(r.vec_id, r.neighbor_id) for r in exact.collect()}
    got = {(r.vec_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9


def test_ivf_cell_assignment_deterministic(spark):
    """Centroid sampling and cell assignment are deterministic across
    invocations (md5-ordered sample, no RNG state)."""
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    from flink_efo_spark.operators.similarity import ivf_centroids

    c1 = ivf_centroids(df, "vec_id", "embedding", 4)
    c2 = ivf_centroids(df, "vec_id", "embedding", 4)
    assert c1 == c2
    assert [cid for cid, _ in c1] == [0, 1, 2, 3]


def test_quantize_embeddings_error_bound(spark):
    """int8 symmetric quantization: codes within [-127, 127], per-dim
    reconstruction error <= scale/2, cosine error tiny on real
    vectors."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.similarity import quantize_embeddings
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = quantize_embeddings(emb, "vec_id", "embedding").collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert all(-127 <= c <= 127 for c in r.codes)
        assert r.cos_error < 1e-3


def test_quantize_zero_vector_guard(spark):
    """All-zero vectors must not trip ANSI division: zero codes,
    NULL cosine error."""
    from flink_efo_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, -4.0])], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df, "vec_id", "embedding").collect()}
    assert rows[1].scale == 0.0 and rows[1].codes == [0, 0]
    assert rows[1].cos_error is None
    assert rows[2].cos_error is not None and rows[2].cos_error < 1e-3


def test_ivf_index_roundtrip_and_pruning(spark, tmp_path):
    """Persisted IVF index: query results are row-identical to the
    in-memory ivf_cosine_topk, and the index scan is statically
    partition-pruned to the probed cells."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.similarity import (
        ivf_build_index,
        ivf_cosine_topk,
        ivf_query_index,
    )
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    idx_dir = str(tmp_path / "ivf")
    ivf_build_index(emb, "vec_id", idx_dir, n_cells=16)

    got = ivf_query_index(
        spark, idx_dir, q, "vec_id", k=5, nprobe=4
    )
    want = ivf_cosine_topk(
        q, emb, "vec_id", "vec_id", k=5, n_cells=16, nprobe=4
    )
    g = sorted((r.vec_id, r.neighbor_id, round(r.score, 9), r.rank) for r in got.collect())
    w = sorted((r.vec_id, r.neighbor_id, round(r.score, 9), r.rank) for r in want.collect())
    assert g == w and len(g) > 0

    # partition pruning must reach the scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf_sections = plan.split("PartitionFilters")[1:]
    assert any("cell" in s[:250] for s in pf_sections), plan


def test_rrf_fuse_semantics(spark):
    """RRF (Cormack et al.): 1/(k+rank) per list, ids in a single
    list still score, `top` caps each list, ties break on id."""
    import pytest as _pytest

    from flink_efo_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0), (4, 1.0)], "id long, s double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (5, 0.8), (1, 0.7)], "id long, s double"
    )
    out = {
        r.doc_id: (r.n_lists, r.rrf_score)
        for r in rrf_fuse([(a, "id", "s"), (b, "id", "s")], k=10).collect()
    }
    # list a ranks: 1->1, 2->2 (tie 5.0 broken by id), 3->3, 4->4
    # list b ranks: 2->1, 5->2, 1->3
    assert out[1] == (2, round(1 / 11 + 1 / 13, 8))
    assert out[2] == (2, round(1 / 12 + 1 / 11, 8))
    assert out[3] == (1, round(1 / 13, 8))
    assert out[5] == (1, round(1 / 12, 8))
    # top=2 drops ranks > 2 from each list
    capped = {
        r.doc_id: r.n_lists
        for r in rrf_fuse(
            [(a, "id", "s"), (b, "id", "s")], k=10, top=2
        ).collect()
    }
    # id 1's list-b rank (3) is cut: it survives via list a only
    assert capped == {1: 1, 2: 2, 5: 1}
    with _pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_kmeans_train_properties(spark):
    """Lloyd's invariants on real data: k*d output rows, sizes sum to
    the corpus, and the run is bit-identical across physical
    repartitionings (the exact-integer design's whole point)."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.similarity import kmeans_train
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    out = kmeans_train(emb, "vec_id", "embedding", k=4, n_iter=2)
    rows = out.collect()
    dim = emb.select(F.size("embedding")).first()[0]
    assert len(rows) == 4 * dim
    sizes = {}
    for r in rows:
        sizes[r.cid] = r.size
    assert sum(sizes.values()) == n

    # determinism under a different physical layout
    out2 = kmeans_train(
        emb.repartition(7, "vec_id"), "vec_id", "embedding", k=4, n_iter=2
    )
    assert sorted(map(tuple, out2.collect())) == sorted(map(tuple, rows))


def test_kmeans_inertia_non_increasing(spark):
    """More Lloyd iterations never increase within-cluster variance
    (measured on the quantized grid the trainer optimizes over)."""
    import math
    import random

    from flink_efo_spark.operators.similarity import kmeans_train

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")

    def inertia(cent_rows):
        cents = {}
        for r in cent_rows:
            cents.setdefault(r.cid, [0.0] * 8)[r.pos] = r.cent_val
        q = {i: [math.floor(v * 1e6) / 1e6 for v in vec] for i, vec in rows}
        tot = 0.0
        for vec in q.values():
            tot += min(
                sum((a - b) ** 2 for a, b in zip(vec, c))
                for c in cents.values()
            )
        return tot

    i1 = inertia(kmeans_train(df, "vec_id", "embedding", k=3, n_iter=1).collect())
    i3 = inertia(kmeans_train(df, "vec_id", "embedding", k=3, n_iter=3).collect())
    assert i3 <= i1 + 1e-9


def test_ivf_accepts_trained_centroids(spark, tmp_path):
    """The kmeans-trained coarse quantizer drops into every IVF
    entry point: ivf_cosine_topk(centroids=...) and a persisted
    ivf_build_index/ivf_query_index round-trip agree row-for-row,
    and results are valid descending top-k lists."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.similarity import (
        ivf_build_index,
        ivf_cosine_topk,
        ivf_query_index,
        kmeans_centroids,
    )
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = kmeans_centroids(emb, "vec_id", "embedding", n_cells=4, n_iter=2)
    assert [c for c, _ in cents] == [0, 1, 2, 3]

    queries = emb.orderBy("vec_id").limit(5)
    direct = ivf_cosine_topk(
        queries, emb, "vec_id", "vec_id", k=3, n_cells=4, nprobe=2,
        centroids=cents,
    ).collect()

    idx_dir = str(tmp_path / "ivf_trained")
    ivf_build_index(emb, "vec_id", idx_dir, n_cells=4, centroids=cents)
    via_index = ivf_query_index(
        spark, idx_dir, queries, "vec_id", k=3, nprobe=2
    ).collect()

    key = lambda r: (r.vec_id, r.rank)
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_index))
    by_q = {}
    for r in direct:
        by_q.setdefault(r.vec_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_pq_encode_and_adc_match_bruteforce(spark):
    """PQ invariants vs a pure-python reference on tiny vectors:
    codes are the per-subspace argmin (ties to lower code), ADC
    distances are the exact LUT sums, and the top-k order matches."""
    import math

    from flink_efo_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    dim, n_sub, k, scale = 8, 2, 2, 1_000_000
    vecs = [
        (i, [((i * 7 + j * 13) % 50 - 25) / 30.0 for j in range(dim)])
        for i in range(20)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    books = pq_train(df, "vec_id", "embedding", dim, n_sub, k, n_iter=1)
    assert len(books) == n_sub and all(len(b) == k for b in books)

    # python reference: quantize, encode, ADC
    def quant(v):
        return [math.floor(x * scale) for x in v]

    def enc(vq):
        out = []
        for s in range(n_sub):
            sub = vq[s * 4 : (s + 1) * 4]
            dists = [
                (sum((a - b) * (a - b) for a, b in zip(sub, cent)), c)
                for c, cent in enumerate(books[s])
            ]
            out.append(min(dists)[1])
        return out

    codes = {r.vec_id: (r.code_0, r.code_1)
             for r in pq_encode(df, "vec_id", "embedding", books).collect()}
    for i, v in vecs:
        assert codes[i] == tuple(enc(quant(v))), i

    query = vecs[3][1]
    qq = quant(query)
    luts = [
        [
            sum((a - b) * (a - b)
                for a, b in zip(qq[s * 4 : (s + 1) * 4], cent))
            for cent in books[s]
        ]
        for s in range(n_sub)
    ]
    want = sorted(
        (sum(luts[s][c] for s, c in enumerate(enc(quant(v)))), i)
        for i, v in vecs
    )[:5]
    enc_df = pq_encode(df, "vec_id", "embedding", books)
    got = [
        (r.adc_dist, r.vec_id)
        for r in pq_adc_topk(enc_df, "vec_id", books, query, topk=5).collect()
    ]
    assert got == want


def test_pq_train_repartition_invariant(spark):
    """Training is bit-identical regardless of partitioning — the
    exact-integer discipline inherited from kmeans_train."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.similarity import pq_train
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    b1 = pq_train(emb, "vec_id", "embedding", 64, n_sub=4, k=4, n_iter=1)
    b2 = pq_train(
        emb.repartition(13), "vec_id", "embedding", 64, n_sub=4, k=4, n_iter=1
    )
    assert b1 == b2


def test_semantic_dedup_bruteforce_parity(spark):
    """semantic_dedup vs a literal numpy replay of SemDeDup on real
    data: md5-ordered seed centroids, argmax assignment (ties to the
    lower cid), policy order, and the paper's drop rule (drop x iff
    ANY earlier-sorted y — kept or dropped — has cos >= tau). Exact
    row-set equality, all three keep policies."""
    import hashlib

    import numpy as np

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.similarity import semantic_dedup
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").where(F.col("vec_id") < 120)
    rows = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    ids = sorted(rows)
    k, tau = 4, 0.3

    seeds = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:k]
    cents = [rows[s] for s in seeds]

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    assign, csim = {}, {}
    for i in ids:
        scores = [(cos(rows[i], c), -cid) for cid, c in enumerate(cents)]
        s, ncid = max(scores)
        assign[i], csim[i] = -ncid, s

    for keep, keyf in [
        ("max_centroid_sim", lambda i: (-csim[i], i)),
        ("min_centroid_sim", lambda i: (csim[i], i)),
        ("min_id", lambda i: i),
    ]:
        expected = set()
        for c in range(k):
            members = sorted((i for i in ids if assign[i] == c), key=keyf)
            for pos, x in enumerate(members):
                if not any(cos(rows[x], rows[y]) >= tau
                           for y in members[:pos]):
                    expected.add(x)
        out = semantic_dedup(emb, "vec_id", n_clusters=k, threshold=tau, keep=keep)
        got = {r.vec_id for r in out.collect()}
        assert got == expected, (keep, got ^ expected)


def test_semantic_dedup_repartition_invariant_and_guard(spark):
    import pytest

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.similarity import semantic_dedup
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    a = semantic_dedup(emb, "vec_id", n_clusters=8, threshold=0.3)
    b = semantic_dedup(
        emb.repartition(7, "vec_id"), "vec_id", n_clusters=8, threshold=0.3
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    with pytest.raises(ValueError, match="keep must be"):
        semantic_dedup(emb, "vec_id", keep="newest")
    with pytest.raises(ValueError, match="non-empty"):
        semantic_dedup(emb, "vec_id", centroids=[])
    with pytest.raises(ValueError, match="n_clusters must be"):
        semantic_dedup(emb, "vec_id", n_clusters=0)


def test_semantic_dedup_auto_k(spark):
    """n_clusters=None derives k = ceil(n / target_cluster_size) —
    the scale discipline encoded. Equivalent to passing the derived k
    explicitly; guard rejects a nonsensical target."""
    import pytest

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.similarity import semantic_dedup
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()  # 500 -> k = 4 at target 125
    auto = semantic_dedup(
        emb, "vec_id", n_clusters=None, threshold=0.3,
        target_cluster_size=125,
    )
    explicit = semantic_dedup(emb, "vec_id", n_clusters=-(-n // 125),
                              threshold=0.3)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    with pytest.raises(ValueError, match="target_cluster_size"):
        semantic_dedup(emb, "vec_id", n_clusters=None,
                       target_cluster_size=0)
