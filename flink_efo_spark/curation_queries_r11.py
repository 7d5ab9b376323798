"""Round-11 staging: corpus queries + DuckDB oracles for the round-10
additions. The staged set (22 pairs) covers:

* span remediation — duplicate_span_positions / cut_duplicate_spans
  (Lee et al. 2021, arXiv:2107.06499: the ExactSubstr CUT) + the
  fused curation_pipeline_v3 (cut -> BPE-budgeted pack);
* streaming — stream_semantic_dedup (epoch-store semantic member of
  the streaming dedup family) and stream_curation_gate (per-batch
  funnel filtering with exactly-once accounting);
* token budgeting — bpe_token_estimate, pack_shards_bpe,
  pack_sequences (fixed-length training-sequence segment map);
* filter rulesets — gopher_quality_flags, gopher_repetition_flags
  (Rae et al. 2021 A1.1), c4_clean (Raffel et al. 2020 §2.2),
  curation_funnel_report;
* scoring — quality_logistic_probe, ngram_lm_perplexity (CCNet,
  arXiv:1911.00359), ccnet_lm_buckets (head/middle/tail terciles),
  tfidf_top_terms, vocab_stats;
* corpus surgery — domain_mixture_plan / domain_mixture_resample
  (DoReMi-style reweighting), decontaminate, boilerplate_topk, and
  the end-to-end curation_pipeline_v4 (decontaminate -> repetition
  filter -> rebalance -> sequence packing, one plan).

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
from pyspark.sql import functions as F

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


# DuckDB mirror of text._bpe_estimate_expr: same RE2-safe GPT-2
# pre-tokenizer, same per-class integer costs (core length excludes
# the absorbed leading space; '' doubles the apostrophe in SQL).
_BPE_CORE_DD = "(length(p) - CASE WHEN substr(p, 1, 1) = ' ' THEN 1 ELSE 0 END)"
_BPE_HEAD_DD = (
    "substr(p, CASE WHEN substr(p, 1, 1) = ' ' THEN 2 ELSE 1 END, 1)"
)
_BPE_PIECES_DD = (
    "regexp_extract_all(text,"
    " '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+')"
)
_BPE_COST_DD = f"""CASE
      WHEN regexp_matches(p, '^''(?:s|t|re|ve|m|ll|d)$') THEN 1
      WHEN regexp_matches({_BPE_HEAD_DD}, '^\\s') THEN 1
      WHEN regexp_matches({_BPE_HEAD_DD}, '^\\p{{L}}')
        THEN greatest(1, ({_BPE_CORE_DD} + 3) // 4 - 1)
      WHEN regexp_matches({_BPE_HEAD_DD}, '^\\p{{N}}')
        THEN ({_BPE_CORE_DD} + 2) // 3
      ELSE ({_BPE_CORE_DD} + 1) // 2
    END"""
_TOKS_DD = "list_filter(string_split_regex(trim(lower(text)), ' +'), t -> t != '')"


@_q(
    "bpe_token_estimate",
    f"""
    SELECT doc_id,
           CAST(list_sum(list_transform({_BPE_PIECES_DD},
                p -> {_BPE_COST_DD})) AS BIGINT) AS bpe_est_tokens,
           CAST(len({_BPE_PIECES_DD}) AS BIGINT) AS n_pieces,
           CAST(len({_TOKS_DD}) AS BIGINT) AS ws_tokens
    FROM documents
    """,
)
def q_bpe_token_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-faithful token counting (GPT-2 pre-tokenizer +
    per-class integer costs approximating cl100k-family behavior) —
    the budget signal a trainer actually bills by, vs the whitespace
    count that under-charges code/punct/numbers. Exact-integer
    arithmetic, RE2-safe regex: the oracle replays both verbatim."""
    from flink_efo_spark.operators.text import bpe_token_estimate

    docs = load_table(spark, sf_dir, "documents")
    return bpe_token_estimate(docs, "doc_id", "text")


@_q(
    "pack_shards_bpe",
    f"""
    SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start_pos,
           CAST(floor((sum(n_tokens) OVER w - n_tokens) / 4000.0) AS BIGINT)
             AS shard_id
    FROM (SELECT doc_id,
                 CAST(coalesce(list_sum(list_transform({_BPE_PIECES_DD},
                      p -> {_BPE_COST_DD})), 0) AS BIGINT) AS n_tokens,
                 md5(CAST(doc_id AS VARCHAR)) AS okey
          FROM documents)
    WINDOW w AS (ORDER BY okey, doc_id)
    """,
)
def q_pack_shards_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_shards under the BPE-estimate counter: shard budgets track
    the trainer's tokenizer instead of whitespace. Same bucketed
    prefix-sum decomposition; the oracle's global window is what the
    operator decomposes into."""
    from flink_efo_spark.operators.packing import pack_shards

    docs = load_table(spark, sf_dir, "documents")
    return pack_shards(
        docs, "doc_id", "text", shard_tokens=4000, counter="bpe_estimate"
    )


# DuckDB mirror of text.logistic_probe_scores' fixed-order float
# pipeline: exact-integer sufficient statistics -> CAST AS DOUBLE ->
# the SAME cofactor expansions (with the symmetric entries d=b, g=c,
# h=f substituted by value) -> per-doc dot product, rounded to 6.
_PROBE_FEAT_DD = f"""
    feat AS (
      SELECT doc_id,
        CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        round(CAST(len(list_filter({_TOKS_DD},
          t -> list_contains(['the','and','of','to','a','in','is','that','for','it'], t)))
          AS DOUBLE) / greatest(len({_TOKS_DD}), 1), 4) AS f1,
        round(0.4 * least(CAST(len(list_filter(string_split_regex(trim(lower(text)), ' +'), t -> t != '')) AS DOUBLE) / 100.0, 1.0)
            + 0.3 * least((CAST(len(list_filter(list_filter(string_split_regex(trim(lower(text)), ' +'), t -> t != ''),
                t -> list_contains(['the','and','of','to','a','in','is','that','for','it'], t)))
                AS DOUBLE) / greatest(len(list_filter(string_split_regex(trim(lower(text)), ' +'), t -> t != '')), 1)) * 5, 1.0)
            + 0.3 * (1.0 - least((CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0))
                AS DOUBLE) / greatest(length(text), 1)) * 10, 1.0)), 4) AS f2
      FROM documents),
    qz AS (
      SELECT doc_id, 2 * y - 1 AS s,
             CAST(10000 AS BIGINT) AS x0,
             CAST(round(f1 * 10000, 0) AS BIGINT) AS x1,
             CAST(round(f2 * 10000, 0) AS BIGINT) AS x2
      FROM feat),
    st AS (
      SELECT CAST(sum(x0*x0) AS DOUBLE) AS a, CAST(sum(x0*x1) AS DOUBLE) AS b,
             CAST(sum(x0*x2) AS DOUBLE) AS c, CAST(sum(x1*x1) AS DOUBLE) AS e,
             CAST(sum(x1*x2) AS DOUBLE) AS f, CAST(sum(x2*x2) AS DOUBLE) AS i,
             CAST(sum(x0*s) AS DOUBLE) AS g0, CAST(sum(x1*s) AS DOUBLE) AS g1,
             CAST(sum(x2*s) AS DOUBLE) AS g2
      FROM qz),
    w AS (
      SELECT
        (g0*(e*i - f*f) - b*(g1*i - f*g2) + c*(g1*f - e*g2))
          / (a*(e*i - f*f) - b*(b*i - f*c) + c*(b*f - e*c)) AS u0,
        (a*(g1*i - f*g2) - g0*(b*i - f*c) + c*(b*g2 - g1*c))
          / (a*(e*i - f*f) - b*(b*i - f*c) + c*(b*f - e*c)) AS u1,
        (a*(e*g2 - g1*f) - b*(b*g2 - g1*c) + g0*(b*f - e*c))
          / (a*(e*i - f*f) - b*(b*i - f*c) + c*(b*f - e*c)) AS u2
      FROM st)
"""


@_q(
    "quality_logistic_probe",
    f"""
    WITH {_PROBE_FEAT_DD}
    SELECT qz.doc_id,
           round((qz.x0 * w.u0 + qz.x1 * w.u1 + qz.x2 * w.u2) * 2, 6)
             AS logit
    FROM qz CROSS JOIN w
    """,
)
def q_quality_logistic_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier calibration: one-step-Newton logistic probe
    from (stopword_ratio, quality_score) to the is-English label —
    exact-integer sufficient statistics, fixed-order Cramer solve,
    per-doc calibrated logit rounded to 6 decimals."""
    from flink_efo_spark.operators.text import (
        logistic_probe_scores,
        quality_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    qs = quality_stats(docs, "doc_id", "text")
    labeled = qs.join(
        docs.select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("y")
        ),
        "doc_id",
    )
    return logistic_probe_scores(
        labeled, "doc_id", "y", ("stopword_ratio", "quality_score")
    )


@_q(
    "curation_pipeline_v3",
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
      SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
      FROM kept GROUP BY doc_id),
    cleaned AS (
      SELECT d.doc_id,
             CASE WHEN d.text IS NULL THEN NULL
                  ELSE coalesce(a.clean_text, '') END AS text
      FROM documents d LEFT JOIN agg a USING (doc_id))
    SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER w - n_tokens AS BIGINT) AS start_pos,
           CAST(floor((sum(n_tokens) OVER w - n_tokens) / 4000.0) AS BIGINT)
             AS shard_id
    FROM (SELECT doc_id,
                 CAST(coalesce(list_sum(list_transform({_BPE_PIECES_DD},
                      p -> {_BPE_COST_DD})), 0) AS BIGINT) AS n_tokens,
                 md5(CAST(doc_id AS VARCHAR)) AS okey
          FROM cleaned)
    WINDOW w AS (ORDER BY okey, doc_id)
    """,
)
def q_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end remediation + budgeting as ONE declarative plan:
    cut the cross-document duplicate passages out of every document
    (cut_duplicate_spans), then lay the CLEANED corpus into
    BPE-estimate-budgeted training shards (pack_shards,
    counter="bpe_estimate"). Both stages' determinism carries — exact
    intervals, exact integer token costs, md5 corpus order."""
    from flink_efo_spark.operators.dedup import cut_duplicate_spans
    from flink_efo_spark.operators.packing import pack_shards

    docs = load_table(spark, sf_dir, "documents")
    cleaned = cut_duplicate_spans(
        docs, "doc_id", "text", window=6, min_docs=2
    ).select("doc_id", F.col("clean_text"))
    return pack_shards(
        cleaned, "doc_id", "clean_text",
        shard_tokens=4000, counter="bpe_estimate",
    )


@_q(
    "ngram_lm_perplexity",
    """
    WITH tt AS (
      SELECT string_split(trim(lower(text)), ' ') AS t
      FROM documents WHERE lang = 'en' AND text IS NOT NULL),
    tb AS (
      SELECT CAST(CAST(('0x' || substr(md5(u.a), 1, 15)) AS BIGINT) % 256
               AS INT) AS b1,
             CAST(CAST(('0x' || substr(md5(u.b), 1, 15)) AS BIGINT) % 256
               AS INT) AS b2
      FROM (SELECT unnest([{'a': t[i], 'b': t[i+1]}
                           for i in range(1, len(t))]) AS u
            FROM tt)),
    cnt AS (SELECT b1, b2, count(*) AS c FROM tb GROUP BY b1, b2),
    ctx AS (SELECT b1, sum(c) AS cc FROM cnt GROUP BY b1),
    spine AS (
      SELECT CAST(t1.range AS INT) AS b1, CAST(t2.range AS INT) AS b2
      FROM range(256) t1, range(256) t2),
    lm AS (
      SELECT s.b1, s.b2,
             CAST(round(ln((coalesce(c, 0) + 1.0)
                           / (coalesce(cc, 0) + 256.0)) * 1000000, 0)
               AS BIGINT) AS micro_logp
      FROM spine s
      LEFT JOIN cnt USING (b1, b2)
      LEFT JOIN ctx USING (b1)),
    dt AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
      FROM documents WHERE text IS NOT NULL),
    db AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substr(md5(u.a), 1, 15)) AS BIGINT) % 256
               AS INT) AS b1,
             CAST(CAST(('0x' || substr(md5(u.b), 1, 15)) AS BIGINT) % 256
               AS INT) AS b2
      FROM (SELECT doc_id, unnest([{'a': t[i], 'b': t[i+1]}
                                   for i in range(1, len(t))]) AS u
            FROM dt)),
    sc AS (
      SELECT doc_id, count(*) AS n, sum(micro_logp) AS sm
      FROM db JOIN lm USING (b1, b2) GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(n, 0) AS BIGINT) AS n_bigrams,
           CAST(coalesce(sm, 0) AS BIGINT) AS sum_micro_logp,
           round(CASE WHEN coalesce(n, 0) = 0 THEN NULL
                      ELSE -coalesce(sm, 0) / 1000000.0 / n END, 6)
             AS cross_entropy
    FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
    LEFT JOIN sc USING (doc_id)
    """,
)
def q_ngram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filtering (Wenzek et al. 2020,
    arXiv:1911.00359): fit a hashed Laplace-smoothed conditional
    bigram model on the ENGLISH slice, score every document's
    cross-entropy under it (low = target-like, high = junk). Bigram
    log-probs are micro-nat integers on a complete 256^2 spine, so
    per-doc sums are exact and the oracle replays the model
    bit-for-bit."""
    from flink_efo_spark.operators.sampling import (
        ngram_lm_fit,
        ngram_lm_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    lm = ngram_lm_fit(
        docs.where(F.col("lang") == "en"), "text", num_buckets=256
    )
    return ngram_lm_score(docs, "doc_id", "text", lm, num_buckets=256)


@_q(
    "gopher_quality_flags",
    r"""
    WITH base AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(text, '\s+'), w -> w != '') AS W,
        string_split_regex(text, '\n') AS L,
        coalesce(list_sum(list_transform(
          list_filter(string_split_regex(text, '\s+'), w -> w != ''),
          w -> length(w))), 0) AS sum_len
      FROM documents),
    fl AS (
      SELECT doc_id,
        CAST(CASE WHEN text IS NULL THEN 0 ELSE len(W) END AS BIGINT)
          AS n_words,
        coalesce(text IS NOT NULL
          AND len(W) BETWEEN 50 AND 100000, FALSE) AS ok_word_count,
        coalesce(text IS NOT NULL AND len(W) > 0
          AND 3 * len(W) <= sum_len AND sum_len <= 10 * len(W), FALSE)
          AS ok_mean_word_len,
        coalesce(text IS NOT NULL
          AND 10 * len(regexp_extract_all(text, '#|\.\.\.|…')) <= len(W),
          FALSE) AS ok_symbol_ratio,
        coalesce(text IS NOT NULL
          AND 10 * len(list_filter(L,
                l -> regexp_matches(l, '^\s*[-*•]'))) <= 9 * len(L),
          FALSE) AS ok_bullet_lines,
        coalesce(text IS NOT NULL
          AND 10 * len(list_filter(L,
                l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) <= 3 * len(L),
          FALSE) AS ok_ellipsis_lines,
        coalesce(text IS NOT NULL
          AND 10 * len(list_filter(W,
                w -> regexp_matches(w, '\p{L}'))) >= 8 * len(W),
          FALSE) AS ok_alpha_words,
        coalesce(text IS NOT NULL
          AND len(list_intersect(list_distinct(
                list_transform(W, w -> lower(w))),
                ['the','be','to','of','and','that','have','with'])) >= 2,
          FALSE) AS ok_stopwords
      FROM base)
    SELECT *,
      (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
       AND ok_bullet_lines AND ok_ellipsis_lines AND ok_alpha_words
       AND ok_stopwords) AS keep
    FROM fl
    """,
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveWeb quality ruleset (Rae et al. 2021,
    arXiv:2112.11446 A1.1) over every document: per-rule booleans +
    the combined keep flag, all thresholds as cross-multiplied exact
    integers — no float anywhere, engine-exact."""
    from flink_efo_spark.operators.text import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs, "doc_id", "text")


@_q(
    "c4_clean",
    r"""
    WITH base AS (
      SELECT doc_id, text, string_split_regex(text, '\n') AS L
      FROM documents),
    k AS (
      SELECT doc_id, text, len(L) AS nl,
        list_filter(L, l -> regexp_matches(l, '[.!?]["’”]?\s*$')
          AND len(list_filter(string_split_regex(l, '\s+'),
                              w -> w != '')) >= 5
          AND NOT regexp_matches(lower(l), 'javascript')) AS KL
      FROM base),
    c AS (
      SELECT doc_id, text, nl, len(KL) AS kl,
        -- array_to_string([]) is NULL in DuckDB; Spark concat_ws
        -- over an empty array is '' — align on ''
        coalesce(array_to_string(KL, chr(10)), '') AS clean
      FROM k)
    SELECT doc_id,
      CASE WHEN text IS NULL THEN NULL ELSE clean END AS clean_text,
      CAST(CASE WHEN text IS NULL THEN 0 ELSE nl END AS BIGINT) AS n_lines,
      CAST(CASE WHEN text IS NULL THEN 0 ELSE kl END AS BIGINT)
        AS kept_lines,
      CAST(CASE WHEN text IS NULL THEN 0
           ELSE len(regexp_extract_all(clean, '[.!?]')) END AS BIGINT)
        AS n_sentences,
      coalesce(text IS NOT NULL AND contains(text, '{'), FALSE)
        AS has_brace,
      coalesce(text IS NOT NULL AND contains(lower(text), 'lorem ipsum'),
               FALSE) AS has_lorem,
      coalesce(text IS NOT NULL AND NOT contains(text, '{')
        AND NOT contains(lower(text), 'lorem ipsum')
        AND len(regexp_extract_all(clean, '[.!?]')) >= 3, FALSE) AS keep
    FROM c
    """,
)
def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 line/page cleaning rules (Raffel et al. 2020 §2.2):
    line filter (terminal punctuation, >= 5 words, no javascript) +
    page flags (curly brace, lorem ipsum, >= 3 surviving sentences) —
    the line-level remediation sibling of gopher_quality_flags, all
    order-preserving and engine-exact."""
    from flink_efo_spark.operators.text import c4_clean

    docs = load_table(spark, sf_dir, "documents")
    return c4_clean(docs, "doc_id", "text")


def _dd_dup_gram(n: int) -> str:
    """DuckDB dup-n-gram char sum via the total-minus-distinct
    identity (mirrors text.gopher_repetition_flags' narrow fold)."""
    g = (
        f"[array_to_string(W[i:i+{n - 1}], ' ')"
        f" for i in range(1, len(W) - {n - 2})]"
    )
    return (
        f"coalesce(list_sum(list_transform({g}, x -> length(x))), 0)"
        f" - coalesce(list_sum(list_transform(list_distinct({g}),"
        f" x -> length(x))), 0)"
    )


_REP_TOP = [(2, 20), (3, 18), (4, 16)]
_REP_DUP = [(5, 15), (6, 14), (7, 13), (8, 12), (9, 11), (10, 10)]

_REP_GRAMS_UNION = " || ".join(
    f"[{{'n': {n}, 'g': array_to_string(W[i:i+{n - 1}], ' ')}}"
    f" for i in range(1, len(W) - {n - 2})]"
    for n, _ in _REP_TOP
)

_REP_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(text, '\\s+'), w -> w != '') AS W,
        string_split(text, chr(10)) AS L,
        string_split(text, chr(10) || chr(10)) AS P
      FROM documents),
    nar AS (
      SELECT doc_id, text IS NOT NULL AS nn,
        CAST(CASE WHEN text IS NULL THEN 0 ELSE length(text) END
          AS BIGINT) AS n_chars,
        CAST(coalesce(len(L), 0) AS BIGINT) AS n_lines,
        CAST(coalesce(len(L) - len(list_distinct(L)), 0) AS BIGINT)
          AS dup_lines,
        CAST(coalesce(list_sum(list_transform(L, x -> length(x))), 0)
          AS BIGINT) AS line_chars,
        CAST(coalesce(list_sum(list_transform(L, x -> length(x))), 0)
          - coalesce(list_sum(list_transform(list_distinct(L),
              x -> length(x))), 0) AS BIGINT) AS dup_line_chars,
        CAST(coalesce(len(P), 0) AS BIGINT) AS n_paras,
        CAST(coalesce(len(P) - len(list_distinct(P)), 0) AS BIGINT)
          AS dup_paras,
        CAST(coalesce(list_sum(list_transform(P, x -> length(x))), 0)
          AS BIGINT) AS para_chars,
        CAST(coalesce(list_sum(list_transform(P, x -> length(x))), 0)
          - coalesce(list_sum(list_transform(list_distinct(P),
              x -> length(x))), 0) AS BIGINT) AS dup_para_chars,
        {", ".join(f"CAST({_dd_dup_gram(n)} AS BIGINT) AS dup{n}_chars"
                   for n, _ in _REP_DUP)}
      FROM base),
    grams AS (
      SELECT doc_id, u.n AS n, u.g AS g
      FROM (SELECT doc_id, unnest({_REP_GRAMS_UNION}) AS u FROM base)),
    gc AS (
      SELECT doc_id, n,
             CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS fp,
             count(*) AS c, max(length(g)) AS glen
      FROM grams GROUP BY doc_id, n, fp),
    cov AS (
      SELECT doc_id,
        {", ".join(
            f"CAST(coalesce(max(CASE WHEN n = {n} AND c >= 2"
            f" THEN c * glen END), 0) AS BIGINT) AS top{n}_cover"
            for n, _ in _REP_TOP)}
      FROM gc GROUP BY doc_id)
    SELECT nar.* EXCLUDE (nn),
      {", ".join(f"CAST(coalesce(cov.top{n}_cover, 0) AS BIGINT)"
                 f" AS top{n}_cover" for n, _ in _REP_TOP)},
      coalesce(nn AND 10 * dup_lines <= 3 * n_lines, FALSE)
        AS ok_dup_lines,
      coalesce(nn AND 10 * dup_paras <= 3 * n_paras, FALSE)
        AS ok_dup_paras,
      coalesce(nn AND 10 * dup_line_chars <= 2 * line_chars, FALSE)
        AS ok_dup_line_chars,
      coalesce(nn AND 10 * dup_para_chars <= 2 * para_chars, FALSE)
        AS ok_dup_para_chars,
      {", ".join(
          f"coalesce(nn AND 100 * coalesce(cov.top{n}_cover, 0)"
          f" <= {pct} * n_chars, FALSE) AS ok_top{n}_gram"
          for n, pct in _REP_TOP)},
      {", ".join(
          f"coalesce(nn AND 100 * dup{n}_chars <= {pct} * n_chars, FALSE)"
          f" AS ok_dup{n}_gram" for n, pct in _REP_DUP)},
      coalesce(nn AND 10 * dup_lines <= 3 * n_lines
        AND 10 * dup_paras <= 3 * n_paras
        AND 10 * dup_line_chars <= 2 * line_chars
        AND 10 * dup_para_chars <= 2 * para_chars
        AND {" AND ".join(
            f"100 * coalesce(cov.top{n}_cover, 0) <= {pct} * n_chars"
            for n, pct in _REP_TOP)}
        AND {" AND ".join(
            f"100 * dup{n}_chars <= {pct} * n_chars"
            for n, pct in _REP_DUP)}, FALSE) AS keep
    FROM nar LEFT JOIN cov USING (doc_id)
"""


@_q("gopher_repetition_flags", _REP_ORACLE)
def q_gopher_repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher/MassiveWeb REPETITION ruleset (Rae et al. 2021
    A1.1 Table A1) over every document: duplicate line/paragraph
    fractions (count- and char-weighted), top-{2,3,4}-gram char
    coverage, duplicated-{5..10}-gram char fractions — 13 per-rule
    booleans + keep, all thresholds cross-multiplied exact integers.
    The companion of gopher_quality_flags; together they are the full
    Gopher filter."""
    from flink_efo_spark.operators.text import gopher_repetition_flags

    docs = load_table(spark, sf_dir, "documents")
    return gopher_repetition_flags(docs, "doc_id", "text")


# Shared mixture targets for the domain-reweighting pair: a genuine
# down-sample (src0/src3), a near-natural rate (src7), a saturated
# group whose target exceeds its natural share (src11, rate pins at
# 65536), and everything unnamed dropped at rate 0.
_MIX_TARGETS = {"src0": 0.02, "src3": 0.03, "src5": 0.04,
                "src7": 0.05, "src11": 0.25}
_MIX_TPPM_CASE = "CASE source " + " ".join(
    f"WHEN '{g}' THEN {int(round(w * 1_000_000))}"
    for g, w in sorted(_MIX_TARGETS.items())
) + " ELSE 0 END"

_MIX_PLAN_CTE = f"""
    tok AS (
      SELECT doc_id, source,
        coalesce(len(list_filter(string_split_regex(trim(lower(text)),
          ' +'), t -> t != '')), 0) AS nt
      FROM documents),
    cnt AS (
      SELECT source, count(*) AS n_docs,
        CAST(sum(greatest(nt, 0)) AS BIGINT) AS n_tokens
      FROM tok GROUP BY source),
    tot AS (SELECT sum(n_tokens) AS total_tokens FROM cnt),
    plan AS (
      SELECT source, n_docs, n_tokens,
        CAST(CAST(1000000 AS HUGEINT) * n_tokens
          // greatest(total_tokens, 1) AS BIGINT) AS natural_ppm,
        CAST({_MIX_TPPM_CASE} AS BIGINT) AS target_ppm,
        CAST(CASE WHEN n_tokens <= 0 THEN 0
          ELSE least(65536,
            CAST(65536 AS HUGEINT) * ({_MIX_TPPM_CASE}) * total_tokens
            // (CAST(1000000 AS HUGEINT) * n_tokens)) END AS BIGINT)
          AS rate_64k
      FROM cnt CROSS JOIN tot)
"""


@_q(
    "domain_mixture_plan",
    f"""
    WITH {_MIX_PLAN_CTE}
    SELECT source, n_docs, n_tokens, natural_ppm, target_ppm, rate_64k,
      CAST(CAST(n_tokens AS HUGEINT) * rate_64k // 65536 AS BIGINT)
        AS projected_tokens
    FROM plan
    """,
)
def q_domain_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-reweighting plan over the corpus's source column:
    exact-integer natural token shares (ppm) and the /65536-quantized
    sampling rates that move the mixture to the target weights —
    DECIMAL(38,0) floor arithmetic, HUGEINT-replayed."""
    from flink_efo_spark.operators.sampling import domain_mixture_plan

    docs = load_table(spark, sf_dir, "documents")
    return domain_mixture_plan(docs, "source", "text", _MIX_TARGETS)


@_q(
    "domain_mixture_resample",
    f"""
    WITH {_MIX_PLAN_CTE}
    SELECT d.doc_id, d.source
    FROM documents d JOIN plan p USING (source)
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
      AS BIGINT) < p.rate_64k
    """,
)
def q_domain_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The plan applied: deterministic hash16 Bernoulli draw per
    document at its group's planned rate — the fused
    plan-then-sample pipeline a mixture rebalance actually runs."""
    from flink_efo_spark.operators.sampling import (
        apply_mixture_plan,
        domain_mixture_plan,
    )

    docs = load_table(spark, sf_dir, "documents")
    plan = domain_mixture_plan(docs, "source", "text", _MIX_TARGETS)
    return apply_mixture_plan(
        docs.select("doc_id", "source"), "doc_id", "source", plan
    )


@_q(
    "pack_sequences",
    f"""
    WITH tok AS (
      SELECT doc_id,
        CAST(coalesce(len({_TOKS_DD}), 0) AS BIGINT) AS n_tokens,
        md5(CAST(doc_id AS VARCHAR)) AS okey
      FROM documents),
    pos AS (
      SELECT doc_id, n_tokens,
        sum(n_tokens) OVER (ORDER BY okey, doc_id) - n_tokens AS start_pos
      FROM tok),
    seg AS (
      SELECT doc_id, n_tokens, start_pos, u.w AS seq_id
      FROM (SELECT doc_id, n_tokens, start_pos,
                   unnest([{{'w': w}} for w in range(
                     CAST(start_pos // 64 AS BIGINT),
                     CAST((start_pos + n_tokens - 1) // 64 + 1 AS BIGINT))]) AS u
            FROM pos WHERE n_tokens > 0))
    SELECT doc_id, n_tokens, CAST(seq_id AS BIGINT) AS seq_id,
      CAST(greatest(start_pos, seq_id * 64) - start_pos AS BIGINT)
        AS doc_offset,
      CAST(greatest(start_pos, seq_id * 64) - seq_id * 64 AS BIGINT)
        AS seq_offset,
      CAST(least(start_pos + n_tokens, seq_id * 64 + 64)
        - greatest(start_pos, seq_id * 64) AS BIGINT) AS seg_len
    FROM seg
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length training-sequence packing: cut the md5-ordered
    corpus token stream into 64-token windows and emit the
    doc→sequence segment map (seq_id, doc_offset, seq_offset,
    seg_len) a data loader joins against — sequences cut THROUGH
    documents, unlike pack_shards. The oracle's global window is
    the spec the hierarchical prefix sum decomposes."""
    from flink_efo_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "text", seq_len=64)


@_q(
    "curation_funnel_report",
    f"""
    WITH rep AS ({_REP_ORACLE}),
    f AS (
      SELECT d.doc_id,
        coalesce(len(list_filter(string_split_regex(trim(lower(d.text)),
          ' +'), t -> t != '')), 0) AS nt,
        md5(trim(lower(d.text))) AS norm,
        d.text IS NOT NULL AS s1,
        coalesce(d.text IS NOT NULL
          AND len(list_filter(string_split_regex(d.text, '\\s+'),
                w -> w != '')) BETWEEN 50 AND 100000, FALSE) AS s2
      FROM documents d),
    s AS (
      SELECT f.doc_id, f.nt, f.norm, f.s1, f.s2,
             f.s2 AND rep.keep AS s3
      FROM f JOIN rep USING (doc_id)),
    rk AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rk
      FROM s WHERE s3),
    fl AS (
      SELECT s.*, coalesce(s.s3 AND rk.rk = 1, FALSE) AS s4
      FROM s LEFT JOIN rk USING (doc_id)),
    agg AS (
      SELECT count(*) AS d0,
        count(*) FILTER (WHERE s1) AS d1,
        count(*) FILTER (WHERE s2) AS d2,
        count(*) FILTER (WHERE s3) AS d3,
        count(*) FILTER (WHERE s4) AS d4,
        coalesce(sum(nt) FILTER (WHERE s1), 0) AS t1,
        coalesce(sum(nt) FILTER (WHERE s2), 0) AS t2,
        coalesce(sum(nt) FILTER (WHERE s3), 0) AS t3,
        coalesce(sum(nt) FILTER (WHERE s4), 0) AS t4
      FROM fl)
    SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_out AS BIGINT) AS docs_out,
           CAST(tokens_out AS BIGINT) AS tokens_out
    FROM (
      SELECT 1 AS stage_idx, 'text_present' AS stage,
             d0 AS docs_in, d1 AS docs_out, t1 AS tokens_out FROM agg
      UNION ALL SELECT 2, 'word_count', d1, d2, t2 FROM agg
      UNION ALL SELECT 3, 'gopher_repetition', d2, d3, t3 FROM agg
      UNION ALL SELECT 4, 'exact_dedup', d3, d4, t4 FROM agg)
    """,
)
def q_curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage drop accounting for a minimal curation chain
    (presence → Gopher word-count gate → full Gopher repetition
    ruleset → exact normalized dedup), each stage applied to the
    previous stage's survivors — the report a curator reads before
    committing a pipeline. One fused plan; always exactly 4 rows."""
    from flink_efo_spark.operators.text import curation_funnel_report

    docs = load_table(spark, sf_dir, "documents")
    return curation_funnel_report(docs, "doc_id", "text")


# 6-token distinct-per-doc spans (the duplicate_spans family's
# shingle definition) — shared by the boilerplate census oracle.
_SPAN6_SH_CTE = """
    sh6 AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 6
               THEN [array_to_string(t[i:i+5], ' ')
                     for i in range(1, len(t) - 4)]
               ELSE [] END) AS shingles
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
            FROM documents))
"""


@_q(
    "boilerplate_topk",
    f"""
    WITH {_SPAN6_SH_CTE},
    f AS (
      SELECT doc_id, s,
             CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS fingerprint
      FROM (SELECT doc_id, unnest(shingles) AS s FROM sh6)),
    c AS (
      SELECT fingerprint,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_occurrences
      FROM f GROUP BY fingerprint
      HAVING count(DISTINCT doc_id) >= 2),
    top AS (
      SELECT * FROM c
      ORDER BY n_docs DESC, n_occurrences DESC, fingerprint
      LIMIT 50),
    ex AS (
      SELECT f.fingerprint, min(f.s) AS example_span
      FROM f JOIN (SELECT fingerprint FROM top) tf USING (fingerprint)
      GROUP BY f.fingerprint)
    SELECT top.fingerprint, n_docs, n_occurrences, example_span
    FROM top JOIN ex USING (fingerprint)
    """,
)
def q_boilerplate_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate census: top-50 most widely shared 6-token
    spans (by distinct-doc count, then occurrences, then
    fingerprint — a total order, deterministic cut line) with a
    min() example surface form. Integer-only first pass; strings
    only shuffle for the broadcast top-k lookup."""
    from flink_efo_spark.operators.dedup import boilerplate_topk

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_topk(docs, "doc_id", "text", window=6, k=50)


@_q(
    "decontaminate",
    """
    WITH sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN [array_to_string(t[i:i+2], ' ')
                     for i in range(1, len(t) - 1)]
               ELSE [] END) AS shingles
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
            FROM documents)),
    ev AS (SELECT DISTINCT unnest(shingles) AS shingle FROM sh
           WHERE doc_id % 97 = 0),
    co AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh
           WHERE doc_id % 97 != 0),
    hits AS (SELECT co.doc_id, count(*) AS h FROM co
             JOIN ev USING (shingle) GROUP BY co.doc_id)
    SELECT d.doc_id, d.source
    FROM documents d LEFT JOIN hits USING (doc_id)
    WHERE d.doc_id % 97 != 0 AND coalesce(h, 0) <= 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination as a transform: every 97th doc
    stands in for the eval suite (the ngram_contamination
    convention); the rest of the corpus is re-emitted minus any
    document sharing a word 3-gram with it."""
    from flink_efo_spark.operators.text import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 97 != 0).select(
        "doc_id", "source", "text"
    )
    ev = docs.where(F.col("doc_id") % 97 == 0)
    return decontaminate(corpus, ev, "doc_id", "text").select(
        "doc_id", "source"
    )


@_q(
    "stream_curation_gate",
    f"""
    WITH rep AS ({_REP_ORACLE}),
    bt AS (
      SELECT doc_id, text,
             CAST(ntile(3) OVER (ORDER BY doc_id) AS INT) AS b
      FROM documents),
    f AS (
      SELECT bt.doc_id, bt.b,
        coalesce(len(list_filter(string_split_regex(trim(lower(bt.text)),
          ' +'), t -> t != '')), 0) AS nt,
        md5(trim(lower(bt.text))) AS norm,
        bt.text IS NOT NULL AS s1,
        coalesce(bt.text IS NOT NULL
          AND len(list_filter(string_split_regex(bt.text, '\\s+'),
                w -> w != '')) BETWEEN 50 AND 100000, FALSE) AS s2
      FROM bt),
    s AS (
      SELECT f.doc_id, f.b, f.nt, f.norm, f.s1, f.s2,
             f.s2 AND rep.keep AS s3
      FROM f JOIN rep USING (doc_id)),
    rk AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY b, norm ORDER BY doc_id)
               AS rk
      FROM s WHERE s3),
    fl AS (
      SELECT s.*, coalesce(s.s3 AND rk.rk = 1, FALSE) AS s4
      FROM s LEFT JOIN rk USING (doc_id)),
    agg AS (
      SELECT b, count(*) AS d0,
        count(*) FILTER (WHERE s1) AS d1,
        count(*) FILTER (WHERE s2) AS d2,
        count(*) FILTER (WHERE s3) AS d3,
        count(*) FILTER (WHERE s4) AS d4,
        coalesce(sum(nt) FILTER (WHERE s1), 0) AS t1,
        coalesce(sum(nt) FILTER (WHERE s2), 0) AS t2,
        coalesce(sum(nt) FILTER (WHERE s3), 0) AS t3,
        coalesce(sum(nt) FILTER (WHERE s4), 0) AS t4
      FROM fl GROUP BY b)
    SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
           CAST(docs_in AS BIGINT) AS docs_in,
           CAST(docs_out AS BIGINT) AS docs_out,
           CAST(tokens_out AS BIGINT) AS tokens_out,
           CAST(b - 1 AS INT) AS epoch
    FROM (
      SELECT b, 1 AS stage_idx, 'text_present' AS stage,
             d0 AS docs_in, d1 AS docs_out, t1 AS tokens_out FROM agg
      UNION ALL SELECT b, 2, 'word_count', d1, d2, t2 FROM agg
      UNION ALL SELECT b, 3, 'gopher_repetition', d2, d3, t3 FROM agg
      UNION ALL SELECT b, 4, 'exact_dedup', d3, d4, t4 FROM agg)
    """,
)
def q_stream_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest curation gate: the documents table replayed
    as 3 doc_id-ordered micro-batches (ntile split, replayed in
    DuckDB verbatim), each batch filtered through the minimal
    curation chain with its 4-row funnel report landed in an
    epoch-addressed stats dir (idempotent overwrite = exactly-once
    accounting on crash replay). All stage flags are doc-local and
    the in-batch dedup is a total order, so the 12 stats rows replay
    bit-for-bit."""
    import tempfile

    from flink_efo_spark.streaming import (
        stream_curation_gate,
        stream_table_split,
    )

    src = stream_table_split(
        spark, sf_dir, "documents", n_batches=3, order_col="doc_id"
    ).select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="efo_curation_gate_")
    q = stream_curation_gate(
        src, "doc_id", "text",
        f"{base}/out", f"{base}/stats", f"{base}/ckpt",
    )
    q.awaitTermination()
    return spark.read.parquet(f"{base}/stats").select(
        "stage_idx", "stage", "docs_in", "docs_out", "tokens_out",
        F.col("epoch").cast("int").alias("epoch"),
    )


@_q(
    "ccnet_lm_buckets",
    f"""
    WITH sc0 AS ({STAGED_ORACLES["ngram_lm_perplexity"]}),
    cuts AS (
      SELECT round(quantile_cont(cross_entropy, {1 / 3!r}), 6) AS c1,
             round(quantile_cont(cross_entropy, {2 / 3!r}), 6) AS c2
      FROM sc0 WHERE cross_entropy IS NOT NULL)
    SELECT doc_id, cross_entropy,
      CASE WHEN cross_entropy IS NULL THEN 'tail'
           WHEN cross_entropy <= c1 THEN 'head'
           WHEN cross_entropy <= c2 THEN 'middle'
           ELSE 'tail' END AS bucket
    FROM sc0 CROSS JOIN cuts
    """,
)
def q_ccnet_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet head/middle/tail split (Wenzek et al. 2020 §4.3):
    fit the hashed bigram LM on the English slice, score every
    document's cross-entropy, cut at the exact 1/3 and 2/3
    percentiles (rounded to 6dp in both engines — the
    token_quantiles interpolation-parity precedent) and label each
    doc. Low perplexity = head = the slice CCNet trains on."""
    from flink_efo_spark.operators.sampling import (
        ngram_lm_fit,
        ngram_lm_score,
        score_terciles,
    )

    docs = load_table(spark, sf_dir, "documents")
    lm = ngram_lm_fit(
        docs.where(F.col("lang") == "en"), "text", num_buckets=256
    )
    scores = ngram_lm_score(
        docs, "doc_id", "text", lm, num_buckets=256
    ).select("doc_id", "cross_entropy")
    return score_terciles(scores, "doc_id", "cross_entropy")


@_q(
    "tfidf_top_terms",
    f"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS_DD}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf
           FROM tk GROUP BY doc_id, term),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    dfq AS (SELECT term, count(DISTINCT doc_id) AS dfx
            FROM tf GROUP BY term),
    idf AS (SELECT term,
              CAST(round(ln((n + 1.0) / (dfx + 1.0)) * 1000000, 0)
                AS BIGINT) AS idf_micro
            FROM dfq CROSS JOIN nd),
    sc AS (SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
                  CAST(tf.tf * idf_micro AS BIGINT) AS score_micro
           FROM tf JOIN idf USING (term)),
    rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score_micro DESC, term) AS rnk FROM sc)
    SELECT doc_id, term, tf, score_micro, CAST(rnk AS INT) AS rank
    FROM rk WHERE rnk <= 5
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-5 terms by tf-idf with
    the idf quantized to integer micro-nats (the ngram_lm convention
    — one ln per TERM, micro-rounded, so scores are exact integers
    both engines agree on; ties break by term)."""
    from flink_efo_spark.operators.text import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=5)


@_q(
    "vocab_stats",
    f"""
    WITH tk AS (SELECT source, unnest({_TOKS_DD}) AS term FROM documents),
    c AS (SELECT source, term, count(*) AS c
          FROM tk GROUP BY source, term),
    m AS (SELECT source, term,
                 row_number() OVER (PARTITION BY source
                   ORDER BY c DESC, term) AS r
          FROM c),
    agg AS (
      SELECT source,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab_size,
             CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax_terms,
             CAST(max(c) AS BIGINT) AS top_term_count
      FROM c GROUP BY source)
    SELECT agg.source, n_tokens, vocab_size, hapax_terms,
           m.term AS top_term, top_term_count
    FROM agg JOIN m ON agg.source = m.source AND m.r = 1
    """,
)
def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary diagnostics: token totals, vocab size,
    hapax counts (OCR-noise / templating signals), and the
    deterministic mode term (max count, least term on ties)."""
    from flink_efo_spark.operators.text import vocab_stats

    docs = load_table(spark, sf_dir, "documents")
    return vocab_stats(docs, "source", "text")


@_q(
    "curation_pipeline_v4",
    f"""
    WITH rep AS ({_REP_ORACLE}),
    shc AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN [array_to_string(t[i:i+2], ' ')
                     for i in range(1, len(t) - 1)]
               ELSE [] END) AS shingles
      FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS t
            FROM documents)),
    evx AS (SELECT DISTINCT unnest(shingles) AS shingle FROM shc
            WHERE doc_id % 97 = 0),
    cox AS (SELECT doc_id, unnest(shingles) AS shingle FROM shc
            WHERE doc_id % 97 != 0),
    hits AS (SELECT cox.doc_id, count(*) AS h FROM cox
             JOIN evx USING (shingle) GROUP BY cox.doc_id),
    surv AS (
      SELECT d.doc_id, d.source, d.text
      FROM documents d LEFT JOIN hits USING (doc_id)
      WHERE d.doc_id % 97 != 0 AND coalesce(h, 0) <= 0),
    filt AS (
      SELECT s.* FROM surv s JOIN rep ON s.doc_id = rep.doc_id
      WHERE rep.keep),
    ftok AS (
      SELECT doc_id, source, text,
        coalesce(len({_TOKS_DD}), 0) AS nt
      FROM filt),
    cnt AS (
      SELECT source, CAST(sum(greatest(nt, 0)) AS BIGINT) AS n_tokens
      FROM ftok GROUP BY source),
    tot AS (SELECT sum(n_tokens) AS total_tokens FROM cnt),
    plan AS (
      SELECT source,
        CAST(CASE WHEN n_tokens <= 0 THEN 0
          ELSE least(65536,
            CAST(65536 AS HUGEINT) * ({_MIX_TPPM_CASE}) * total_tokens
            // (CAST(1000000 AS HUGEINT) * n_tokens)) END AS BIGINT)
          AS rate_64k
      FROM cnt CROSS JOIN tot),
    bal AS (
      SELECT f.doc_id, f.nt FROM ftok f JOIN plan p USING (source)
      WHERE CAST(('0x' || substr(md5(CAST(f.doc_id AS VARCHAR)), 1, 4))
        AS BIGINT) < p.rate_64k),
    pos AS (
      SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
        sum(nt) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
          - nt AS start_pos
      FROM bal),
    seg AS (
      SELECT doc_id, n_tokens, start_pos, u.w AS seq_id
      FROM (SELECT doc_id, n_tokens, start_pos,
                   unnest([{{'w': w}} for w in range(
                     CAST(start_pos // 64 AS BIGINT),
                     CAST((start_pos + n_tokens - 1) // 64 + 1 AS BIGINT))]) AS u
            FROM pos WHERE n_tokens > 0))
    SELECT doc_id, n_tokens, CAST(seq_id AS BIGINT) AS seq_id,
      CAST(greatest(start_pos, seq_id * 64) - start_pos AS BIGINT)
        AS doc_offset,
      CAST(greatest(start_pos, seq_id * 64) - seq_id * 64 AS BIGINT)
        AS seq_offset,
      CAST(least(start_pos + n_tokens, seq_id * 64 + 64)
        - greatest(start_pos, seq_id * 64) AS BIGINT) AS seg_len
    FROM seg
    """,
)
def q_curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end hygiene → filter → rebalance → layout as ONE
    declarative plan: decontaminate against the eval split, keep
    Gopher-repetition survivors, rebalance domains to the mixture
    targets (plan computed on the FILTERED corpus), and lay the
    result into 64-token training sequences. Every stage's
    determinism carries (broadcast eval shingles, doc-local flags,
    HUGEINT rate arithmetic, exact-integer layout), so the final
    segment map replays bit-for-bit."""
    from flink_efo_spark.operators.packing import pack_sequences
    from flink_efo_spark.operators.sampling import (
        apply_mixture_plan,
        domain_mixture_plan,
    )
    from flink_efo_spark.operators.text import (
        decontaminate,
        gopher_repetition_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 97 != 0).select(
        "doc_id", "source", "text"
    )
    ev = docs.where(F.col("doc_id") % 97 == 0)
    clean = decontaminate(corpus, ev, "doc_id", "text")
    keep = gopher_repetition_flags(clean, "doc_id", "text").where(
        "keep"
    ).select("doc_id")
    filtered = clean.join(keep, "doc_id")
    plan = domain_mixture_plan(filtered, "source", "text", _MIX_TARGETS)
    balanced = apply_mixture_plan(filtered, "doc_id", "source", plan)
    return pack_sequences(balanced, "doc_id", "text", seq_len=64)


@_q(
    "sequence_manifest",
    f"""
    WITH tok AS (
      SELECT doc_id,
        CAST(coalesce(len({_TOKS_DD}), 0) AS BIGINT) AS n_tokens,
        md5(CAST(doc_id AS VARCHAR)) AS okey
      FROM documents),
    pos AS (
      SELECT doc_id, n_tokens,
        sum(n_tokens) OVER (ORDER BY okey, doc_id) - n_tokens AS start_pos
      FROM tok),
    seg AS (
      SELECT doc_id, n_tokens, start_pos, u.w AS seq_id
      FROM (SELECT doc_id, n_tokens, start_pos,
                   unnest([{{'w': w}} for w in range(
                     CAST(start_pos // 64 AS BIGINT),
                     CAST((start_pos + n_tokens - 1) // 64 + 1 AS BIGINT))]) AS u
            FROM pos WHERE n_tokens > 0)),
    sl AS (
      SELECT seq_id,
        CAST(least(start_pos + n_tokens, seq_id * 64 + 64)
          - greatest(start_pos, seq_id * 64) AS BIGINT) AS seg_len
      FROM seg)
    SELECT CAST(seq_id AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(seg_len) AS BIGINT) AS filled_tokens,
           sum(seg_len) = 64 AS is_full
    FROM sl GROUP BY seq_id
    """,
)
def q_sequence_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence integrity manifest over the pack_sequences
    segment map: doc counts, filled token totals, and the
    every-window-full-except-the-tail invariant a data loader checks
    before training."""
    from flink_efo_spark.operators.packing import (
        pack_sequences,
        sequence_manifest,
    )

    docs = load_table(spark, sf_dir, "documents")
    segs = pack_sequences(docs, "doc_id", "text", seq_len=64)
    return sequence_manifest(segs, 64)
