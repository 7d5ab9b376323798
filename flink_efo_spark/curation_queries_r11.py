"""Round-11 staging: corpus queries + DuckDB oracles for the round-10
remediation operators — duplicate-span POSITIONS and the span-cut
text transform (operators/dedup.duplicate_span_positions /
cut_duplicate_spans; Lee et al. 2021, arXiv:2107.06499 "Deduplicating
Training Data Makes Language Models Better" — the ExactSubstr
remediation: CUT the duplicated passages, don't just score them).

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
