"""Round-10 staging: corpus queries + DuckDB oracles for the round-9
curation-depth operators — SemDeDup-style semantic deduplication
(operators/similarity.semantic_dedup, Abbas et al. 2023,
arXiv:2303.09540) and DSIR hashed-n-gram importance resampling
(operators/sampling.dsir_*, Xie et al. 2023, arXiv:2302.03169).

REGISTERED in ``__spark_entry__.queries()`` since round 10
(queries.py ``_register_staged_r10``), after a staging round at the
two-scale gate: every pair here is engine-vs-DuckDB verified by
``tests/test_curation_oracles_r10.py`` (the verify_local comparison)
at sf0.001 and sf0.01.

Determinism notes:

* semantic_dedup's centroids are the md5-ordered deterministic
  sample (the IVF coarse-quantizer convention), all cosine math is
  the sequential zip_with/aggregate fold that ``list_dot_product``
  reproduces bit-for-bit, and the within-cluster policy order ties
  break on vec_id — so the DROP decisions compare EXACT doubles and
  the oracle replays them row-for-row. Emitted centroid_sim is
  rounded to 6 decimals (corpus float discipline).
* dsir weights are EXACT INTEGER sums of per-bucket micro-nat log
  ratios (each bucket's single ln() rounds to an integer in both
  engines; no order-dependent float accumulation anywhere), so the
  top-n cut and the weight column itself are engine-exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_efo_spark.catalog import load_table

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn

    return deco


_SEMDEDUP_BASE = """
    v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
      FROM embeddings),
    cents AS (
      SELECT (row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)) - 1 AS cid,
             e AS ce, n AS cn
      FROM v
      QUALIFY row_number() OVER (
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 8),
    assign AS (
      SELECT vec_id, e, n, cid AS cluster, s AS centroid_sim FROM (
        SELECT v.vec_id, v.e, v.n, c.cid,
               list_dot_product(v.e, c.ce) / (v.n * c.cn) AS s,
               row_number() OVER (PARTITION BY v.vec_id
                 ORDER BY list_dot_product(v.e, c.ce) / (v.n * c.cn) DESC,
                          c.cid) AS rn
        FROM v CROSS JOIN cents c) WHERE rn = 1)
"""

_SEMDEDUP_TAIL = """
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM ranked a JOIN ranked b ON a.cluster = b.cluster AND b.rk < a.rk
      WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.3)
    SELECT r.vec_id, CAST(r.cluster AS INT) AS cluster,
           round(r.centroid_sim, 6) AS centroid_sim
    FROM ranked r ANTI JOIN dropped d ON r.vec_id = d.vec_id
"""


@_q(
    "semantic_dedup_central",
    f"""
    WITH {_SEMDEDUP_BASE},
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY cluster
                 ORDER BY centroid_sim DESC, vec_id) AS rk
      FROM assign),
    {_SEMDEDUP_TAIL}
    """,
)
def q_semantic_dedup_central(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep=max_centroid_sim: each near-duplicate chain in a
    cluster keeps its most-central member. EXACTLY oracle-checked —
    deterministic md5-sampled centroids, sequential-fold cosines, id
    tiebreaks, so DuckDB replays centroid choice, assignment, policy
    rank, and every drop decision bit-for-bit."""
    from flink_efo_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "vec_id", n_clusters=8, threshold=0.3, keep="max_centroid_sim"
    )


@_q(
    "semantic_dedup_diverse",
    f"""
    WITH {_SEMDEDUP_BASE},
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY cluster
                 ORDER BY centroid_sim ASC, vec_id) AS rk
      FROM assign),
    {_SEMDEDUP_TAIL}
    """,
)
def q_semantic_dedup_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep=min_centroid_sim — the paper's best-performing
    variant (keeps the least-central member, biasing retained data
    toward cluster edges / diversity)."""
    from flink_efo_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "vec_id", n_clusters=8, threshold=0.3, keep="min_centroid_sim"
    )


_DSIR_ORACLE = """
    WITH toks AS (
      SELECT doc_id, lang, string_split(trim(lower(text)), ' ') AS t
      FROM documents),
    grams AS (
      SELECT doc_id, lang,
             unnest(list_concat(t, CASE WHEN len(t) >= 2
               THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
               ELSE [] END)) AS g
      FROM toks),
    bux AS (
      SELECT doc_id, lang,
             CAST(CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 512
                  AS INT) AS bucket
      FROM grams),
    rawc AS (SELECT bucket, count(*) AS cr FROM bux GROUP BY bucket),
    tgtc AS (SELECT bucket, count(*) AS ct FROM bux
             WHERE lang = 'en' GROUP BY bucket),
    spine AS (SELECT CAST(range AS INT) AS bucket FROM range(512)),
    j AS (SELECT s.bucket, coalesce(cr, 0) AS cr, coalesce(ct, 0) AS ct
          FROM spine s LEFT JOIN rawc USING (bucket)
                       LEFT JOIN tgtc USING (bucket)),
    tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM j),
    lr AS (SELECT bucket,
                  CAST(round((ln((ct + 1.0) / (tt + 512.0))
                            - ln((cr + 1.0) / (tr + 512.0))) * 1000000)
                       AS BIGINT) AS m
           FROM j CROSS JOIN tot),
    w AS (SELECT b.doc_id, sum(m) AS weight_micro
          FROM bux b JOIN lr USING (bucket) GROUP BY b.doc_id)
    SELECT doc_id, CAST(weight_micro AS BIGINT) AS weight_micro,
           weight_micro / 1000000.0 AS weight
    FROM w
    ORDER BY weight_micro DESC, doc_id
    LIMIT 50
"""


@_q("dsir_topn", _DSIR_ORACLE)
def q_dsir_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: raw = all documents, target = the English
    slice, hashed unigram+bigram features in 512 buckets, keep the
    top 50 by importance weight. EXACTLY oracle-checked: weights are
    exact integer micro-nat sums (each bucket's ln() quantized once,
    identically, in both engines), so the cut line and tiebreaks
    replay bit-for-bit."""
    from flink_efo_spark.operators.sampling import dsir_sample

    docs = load_table(spark, sf_dir, "documents")
    # target as a PREDICATE: the fit runs as one fused corpus pass
    # (conditional aggregation) instead of separate raw/target scans —
    # identical counts, identical ratios (sampling.dsir_log_ratios)
    return dsir_sample(
        docs, "doc_id", "text", F.col("lang") == "en",
        n=50, num_buckets=512,
    )


@_q(
    "semantic_dedup_incremental",
    f"""
    WITH {_SEMDEDUP_BASE},
    r1 AS (
      SELECT *, row_number() OVER (PARTITION BY cluster
                 ORDER BY centroid_sim DESC, vec_id) AS rk
      FROM assign WHERE vec_id % 2 = 0),
    d1 AS (
      SELECT DISTINCT a.vec_id
      FROM r1 a JOIN r1 b ON a.cluster = b.cluster AND b.rk < a.rk
      WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.3),
    s1 AS (SELECT r.* FROM r1 r ANTI JOIN d1 d ON r.vec_id = d.vec_id),
    r2 AS (
      SELECT *, row_number() OVER (PARTITION BY cluster
                 ORDER BY centroid_sim DESC, vec_id) AS rk
      FROM assign WHERE vec_id % 2 = 1),
    d2 AS (
      SELECT DISTINCT a.vec_id
      FROM r2 a JOIN r2 b ON a.cluster = b.cluster AND b.rk < a.rk
      WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.3),
    s2a AS (SELECT r.* FROM r2 r ANTI JOIN d2 d ON r.vec_id = d.vec_id),
    dvs AS (
      SELECT DISTINCT a.vec_id
      FROM s2a a JOIN s1 s ON a.cluster = s.cluster
      WHERE list_dot_product(a.e, s.e) / (a.n * s.n) >= 0.3),
    s2 AS (SELECT r.* FROM s2a r ANTI JOIN dvs d ON r.vec_id = d.vec_id)
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           round(centroid_sim, 6) AS centroid_sim
    FROM (SELECT vec_id, cluster, centroid_sim FROM s1
          UNION ALL
          SELECT vec_id, cluster, centroid_sim FROM s2)
    """,
)
def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental semantic dedup as a 2-epoch recurrence (the
    incremental_dedup corpus precedent): epoch 1 = even vec_ids
    deduped within themselves, epoch 2 = odd vec_ids deduped within
    themselves AND against epoch 1's survivor store, fixed md5-sampled
    centroids from the FULL table. The oracle replays both epochs and
    the store comparison as chained CTEs — every drop decision is an
    exact-double comparison, so the union matches bit-for-bit."""
    from flink_efo_spark.operators.similarity import (
        ivf_centroids,
        semantic_dedup_incremental,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, "vec_id", "embedding", 8)
    e1 = emb.where(F.col("vec_id") % 2 == 0)
    e2 = emb.where(F.col("vec_id") % 2 == 1)
    store0 = spark.createDataFrame([], "cluster INT, vec ARRAY<FLOAT>")
    f1, s1 = semantic_dedup_incremental(
        e1, store0, "vec_id", "embedding", centroids=cents, threshold=0.3
    )
    f2, _ = semantic_dedup_incremental(
        e2, s1, "vec_id", "embedding", centroids=cents, threshold=0.3
    )
    return f1.unionAll(f2)


_SPAN_CTE = """
    sh AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 6
        THEN [array_to_string(t[i:i+5], ' ') for i in range(1, len(t) - 4)]
        ELSE [] END)) AS s
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
            FROM documents)),
    fp AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                    AS fingerprint
           FROM sh)
"""


@_q(
    "duplicate_spans",
    f"""
    WITH {_SPAN_CTE}
    SELECT fingerprint,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM fp GROUP BY fingerprint
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring duplication (Lee et al. 2021):
    6-token span fingerprints occurring in >= 2 distinct documents.
    EXACTLY oracle-checked — the md5-hash64 fingerprint and the
    distinct-shingle expression translate verbatim to DuckDB."""
    from flink_efo_spark.operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text", window=6, min_docs=2)


@_q(
    "span_dup_stats",
    f"""
    WITH {_SPAN_CTE},
    nd AS (SELECT fingerprint, count(DISTINCT doc_id) AS ndocs
           FROM fp GROUP BY fingerprint),
    st AS (SELECT f.doc_id, count(*) AS n_windows,
                  sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END)
                    AS dup_windows
           FROM fp f JOIN nd USING (fingerprint) GROUP BY f.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(n_windows, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(dup_windows, 0) AS BIGINT) AS dup_windows,
           CASE WHEN coalesce(n_windows, 0) = 0 THEN NULL
                ELSE CAST(coalesce(dup_windows, 0) AS DOUBLE) / n_windows
           END AS dup_fraction
    FROM documents d LEFT JOIN st USING (doc_id)
    """,
)
def q_span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span filter signal: the fraction of a
    doc's distinct 6-token spans that also appear in another doc.
    dup_fraction is one exact-integer division — engine-reproducible
    without rounding."""
    from flink_efo_spark.operators.dedup import span_dup_stats

    docs = load_table(spark, sf_dir, "documents")
    return span_dup_stats(docs, "doc_id", "text", window=6)


@_q(
    "curation_pipeline_v2",
    f"""
    WITH {_SPAN_CTE},
    nd AS (SELECT fingerprint, count(DISTINCT doc_id) AS ndocs
           FROM fp GROUP BY fingerprint),
    st AS (SELECT f.doc_id, count(*) AS n_windows,
                  sum(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END)
                    AS dup_windows
           FROM fp f JOIN nd USING (fingerprint) GROUP BY f.doc_id),
    sel AS (SELECT d.doc_id, d.text, d.lang,
                   CASE WHEN coalesce(st.n_windows, 0) = 0 THEN NULL
                        ELSE CAST(st.dup_windows AS DOUBLE) / st.n_windows
                   END AS dup_fraction
            FROM documents d LEFT JOIN st USING (doc_id)),
    fdocs AS (SELECT * FROM sel
              WHERE dup_fraction IS NULL OR dup_fraction < 0.5),
    toks2 AS (SELECT doc_id, lang,
                     string_split(trim(lower(text)), ' ') AS t
              FROM fdocs),
    grams2 AS (
      SELECT doc_id, lang,
             unnest(list_concat(t, CASE WHEN len(t) >= 2
               THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
               ELSE [] END)) AS g
      FROM toks2),
    bux2 AS (
      SELECT doc_id, lang,
             CAST(CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 512
                  AS INT) AS bucket
      FROM grams2),
    rawc AS (SELECT bucket, count(*) AS cr FROM bux2 GROUP BY bucket),
    tgtc AS (SELECT bucket, count(*) AS ct FROM bux2
             WHERE lang = 'en' GROUP BY bucket),
    spine AS (SELECT CAST(range AS INT) AS bucket FROM range(512)),
    j AS (SELECT s.bucket, coalesce(cr, 0) AS cr, coalesce(ct, 0) AS ct
          FROM spine s LEFT JOIN rawc USING (bucket)
                       LEFT JOIN tgtc USING (bucket)),
    tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM j),
    lr AS (SELECT bucket,
                  CAST(round((ln((ct + 1.0) / (tt + 512.0))
                            - ln((cr + 1.0) / (tr + 512.0))) * 1000000)
                       AS BIGINT) AS m
           FROM j CROSS JOIN tot),
    w AS (SELECT b.doc_id, sum(m) AS weight_micro
          FROM bux2 b JOIN lr USING (bucket) GROUP BY b.doc_id)
    SELECT w.doc_id, CAST(w.weight_micro AS BIGINT) AS weight_micro,
           w.weight_micro / 1000000.0 AS weight, f.dup_fraction
    FROM w JOIN fdocs f USING (doc_id)
    ORDER BY w.weight_micro DESC, w.doc_id
    LIMIT 30
    """,
)
def q_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline: exact-substring boilerplate filter
    (drop docs with >= 50% duplicated 6-token spans) feeding DSIR
    selection (top 30 toward the English target) — the two staged
    families fused into ONE declarative plan, the corpus_pipeline
    precedent. Both stages' determinism arguments carry over
    unchanged (integer-division fraction, integer micro-nat sums)."""
    from flink_efo_spark.operators.dedup import span_dup_stats
    from flink_efo_spark.operators.sampling import dsir_sample

    docs = load_table(spark, sf_dir, "documents")
    stats = span_dup_stats(docs, "doc_id", "text", window=6)
    # localCheckpoint is load-bearing (the dsir_log_ratios spine
    # precedent): `keep` is O(#docs) rows of (id, fraction) — the
    # lightweight decision table of guide-§8 shape — and feeds the
    # DSIR fit, the scoring pass AND the final join. Without it each
    # consumer re-executes the whole span-fingerprint pass (the
    # dominant cost); with it the span pass runs ONCE.
    keep = (
        stats.where(
            F.col("dup_fraction").isNull() | (F.col("dup_fraction") < 0.5)
        )
        .select("doc_id", "dup_fraction")
        .localCheckpoint(eager=True)
    )
    fdocs = docs.join(keep.select("doc_id"), "doc_id")
    sel = dsir_sample(
        fdocs, "doc_id", "text", F.col("lang") == "en",
        n=30, num_buckets=512,
    )
    return sel.join(keep, "doc_id").select(
        "doc_id", "weight_micro", "weight", "dup_fraction"
    )
