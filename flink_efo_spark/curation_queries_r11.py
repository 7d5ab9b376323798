"""Round-11 staging: corpus queries + DuckDB oracles for the round-10
additions — duplicate-span POSITIONS and the span-cut text transform
(operators/dedup.duplicate_span_positions / cut_duplicate_spans; Lee
et al. 2021, arXiv:2107.06499 "Deduplicating Training Data Makes
Language Models Better" — the ExactSubstr remediation: CUT the
duplicated passages, don't just score them), plus the corpus row for
streaming.stream_semantic_dedup (the epoch-store streaming member of
the semantic dedup family).

NOT registered in ``__spark_entry__.queries()`` yet — the round-10
corpus stays at 318 so the 12 round-10 rows drain as first-time
greens; round 11 merges ``STAGED_QUERIES``/``STAGED_ORACLES`` into
queries.py's dicts (the ``_register_staged_r10`` precedent). Every
pair here must pass the two-scale gate
(``tests/test_curation_oracles_r11.py``, plain + with
``SPARK_GRAFT_SF_DIR_SMALL=/root/testdata/sf0.01``) before that merge.

Determinism notes:

* span positions are exact integers, and overlapping/adjacent spans
  are merged into maximal intervals, so the emitted interval set is
  canonical — independent of scan/partition order in both engines;
* clean_text is rebuilt by position (Spark: ordered array transform;
  DuckDB: ``string_agg(... ORDER BY p)``), so the strings compare
  exactly; all counts are exact integers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_efo_spark.catalog import load_table
from flink_efo_spark.curation_queries_r10 import _SEMDEDUP_BASE

STAGED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
STAGED_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn

    return deco


# Positional span fingerprints + merged dup intervals, shared by both
# oracles. Mirrors dedup._positional_fingerprints (NO list_distinct —
# a passage repeated inside one doc occupies two positions) and the
# gaps-and-islands merge in dedup.duplicate_span_positions.
_SPAN_POS_CTE = """
    toks AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
      FROM documents WHERE text IS NOT NULL),
    fpx AS (
      SELECT doc_id, u.pos AS pos,
             CAST(('0x' || substr(md5(u.s), 1, 15)) AS BIGINT) AS fp
      FROM (SELECT doc_id,
                   unnest([{'pos': i, 's': array_to_string(t[i:i+5], ' ')}
                           for i in range(1, len(t) - 4)]) AS u
            FROM toks)),
    nd AS (SELECT fp FROM fpx GROUP BY fp
           HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT f.doc_id, f.pos FROM fpx f JOIN nd USING (fp)),
    brks AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos > lag(pos) OVER w + 6 THEN 1 ELSE 0 END AS brk
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    isl AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM brks),
    iv AS (
      SELECT doc_id, CAST(min(pos) AS BIGINT) AS token_start,
             CAST(max(pos) + 5 AS BIGINT) AS token_end
      FROM isl GROUP BY doc_id, island)
"""


@_q(
    "duplicate_span_positions",
    f"""
    WITH {_SPAN_POS_CTE}
    SELECT doc_id, token_start, token_end FROM iv
    """,
)
def q_duplicate_span_positions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WHERE the cross-document duplicate passages sit: merged maximal
    [token_start, token_end] intervals (1-indexed, inclusive) of
    6-token spans shared by >= 2 distinct documents. The remediation
    half of Lee et al. 2021 — duplicate_spans says WHAT repeats, this
    says WHERE to cut."""
    from flink_efo_spark.operators.dedup import duplicate_span_positions

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_span_positions(
        docs, "doc_id", "text", window=6, min_docs=2
    )


@_q(
    "cut_duplicate_spans",
    f"""
    WITH {_SPAN_POS_CTE},
    tp AS (
      SELECT doc_id, u.p AS p, u.tok AS tok
      FROM (SELECT doc_id,
                   unnest([{{'p': i, 'tok': t[i]}}
                           for i in range(1, len(t) + 1)]) AS u
            FROM toks)),
    kept AS (
      SELECT tp.doc_id, tp.p, tp.tok FROM tp
      WHERE NOT EXISTS (
        SELECT 1 FROM iv
        WHERE iv.doc_id = tp.doc_id
          AND tp.p BETWEEN iv.token_start AND iv.token_end)),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
             count(*) AS kept_n
      FROM kept GROUP BY doc_id),
    ntok AS (SELECT doc_id, len(t) AS n FROM toks)
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE coalesce(a.clean_text, '') END AS clean_text,
           CAST(coalesce(ntok.n, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(ntok.n, 0) - coalesce(a.kept_n, 0) AS BIGINT)
             AS removed_tokens
    FROM documents d
    LEFT JOIN ntok USING (doc_id)
    LEFT JOIN agg a USING (doc_id)
    """,
)
def q_cut_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the remediation: every document re-emitted with its
    cross-document duplicate passages removed (clean lowercased token
    stream + exact removal counts). The transform composes with
    chunk_documents / pack_shards downstream."""
    from flink_efo_spark.operators.dedup import cut_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return cut_duplicate_spans(docs, "doc_id", "text", window=6, min_docs=2)


def _semdedup_epoch(n: int, batch_pred: str, prior: list[str]) -> str:
    """One epoch of the semantic-dedup recurrence as DuckDB CTEs:
    rank batch ``n`` within clusters, drop within-batch near-dups,
    then drop survivors within threshold of ANY prior epoch's
    survivor (the store comparison)."""
    rank = (
        f"r{n} AS (SELECT *, row_number() OVER (PARTITION BY cluster"
        f" ORDER BY centroid_sim DESC, vec_id) AS rk"
        f" FROM bt WHERE {batch_pred})"
    )
    within = (
        f"d{n} AS (SELECT DISTINCT a.vec_id"
        f" FROM r{n} a JOIN r{n} b ON a.cluster = b.cluster AND b.rk < a.rk"
        f" WHERE list_dot_product(a.e, b.e) / (a.n * b.n) >= 0.3)"
    )
    selfkept = (
        f"s{n}a AS (SELECT r.* FROM r{n} r"
        f" ANTI JOIN d{n} d ON r.vec_id = d.vec_id)"
    )
    if not prior:
        return f"{rank}, {within}, {selfkept}, s{n} AS (SELECT * FROM s{n}a)"
    store = " UNION ALL ".join(f"SELECT cluster, e, n FROM {p}" for p in prior)
    vs_store = (
        f"dv{n} AS (SELECT DISTINCT a.vec_id"
        f" FROM s{n}a a JOIN ({store}) s ON a.cluster = s.cluster"
        f" WHERE list_dot_product(a.e, s.e) / (a.n * s.n) >= 0.3)"
    )
    kept = (
        f"s{n} AS (SELECT r.* FROM s{n}a r"
        f" ANTI JOIN dv{n} d ON r.vec_id = d.vec_id)"
    )
    return f"{rank}, {within}, {selfkept}, {vs_store}, {kept}"


@_q(
    "stream_semantic_dedup",
    f"""
    WITH {_SEMDEDUP_BASE},
    bt AS (SELECT *, ntile(3) OVER (ORDER BY vec_id) AS b FROM assign),
    {_semdedup_epoch(1, "b = 1", [])},
    {_semdedup_epoch(2, "b = 2", ["s1"])},
    {_semdedup_epoch(3, "b = 3", ["s1", "s2"])}
    SELECT vec_id, CAST(cluster AS INT) AS cluster,
           round(centroid_sim, 6) AS centroid_sim
    FROM (SELECT vec_id, cluster, centroid_sim FROM s1
          UNION ALL SELECT vec_id, cluster, centroid_sim FROM s2
          UNION ALL SELECT vec_id, cluster, centroid_sim FROM s3)
    """,
)
def q_stream_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest SEMANTIC dedup through the epoch-dir store
    harness (streaming.stream_semantic_dedup — the third member of
    the streaming dedup family after exact and near): the embeddings
    table replayed as 3 vec_id-ordered micro-batches (ntile split,
    replayed in DuckDB verbatim), each deduped within itself and
    against the persistent survivor-vector store appended by prior
    batches, fixed md5-sampled centroids from the FULL table. The
    oracle chains the 3-epoch recurrence as CTEs; every drop decision
    compares exact doubles, so the union matches bit-for-bit."""
    import tempfile

    from flink_efo_spark.operators.similarity import ivf_centroids
    from flink_efo_spark.streaming import (
        stream_semantic_dedup,
        stream_table_split,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, "vec_id", "embedding", 8)
    src = stream_table_split(
        spark, sf_dir, "embeddings", n_batches=3, order_col="vec_id"
    ).select("vec_id", "embedding")
    base = tempfile.mkdtemp(prefix="efo_sem_dedup_")
    q = stream_semantic_dedup(
        src, "vec_id", "embedding",
        store_dir=f"{base}/store", out_dir=f"{base}/out",
        checkpoint_dir=f"{base}/ckpt",
        centroids=cents, threshold=0.3,
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out").select(
        "vec_id", "cluster", "centroid_sim"
    )
