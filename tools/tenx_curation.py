"""10x scale gate for the round-9 curation operators (the
tools/tenx_directed.py pattern): build 10 disjoint-id copies of the
sf0.1 documents (5k -> 50k docs) and embeddings (2k -> 20k vectors),
then time semantic_dedup, dsir_sample, duplicate_spans, and
span_dup_stats at sf0.1 vs 10x (min-of-2). Linear data paths should
show sublinear wall growth (job-fixed costs amortize); a quadratic
regression would show up as ~100x on the pairwise members.

Usage: python tools/tenx_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_efo_spark.catalog import load_table  # noqa: E402
from flink_efo_spark.operators.dedup import (  # noqa: E402
    duplicate_spans,
    span_dup_stats,
)
from flink_efo_spark.operators.sampling import dsir_sample  # noqa: E402
from flink_efo_spark.operators.similarity import semantic_dedup  # noqa: E402
from flink_efo_spark.session import get_spark  # noqa: E402

COPIES = 10


def _copies(df, id_col):
    """10 disjoint-id copies: copy c shifts ids by c * 10^7 (far above
    any fixture id), so dedup/join keys never collide across copies."""
    return df.sparkSession.range(COPIES).crossJoin(df).select(
        (F.col(id_col) + F.col("id") * 10_000_000).alias(id_col),
        *[c for c in df.columns if c != id_col],
    )


def _time(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def _r10():
    import flink_efo_spark.operators.dedup as m

    return m


def _r10t():
    import flink_efo_spark.operators.text as m

    return m


def _r10p():
    import flink_efo_spark.operators.packing as m

    return m


def _lm(d):
    from flink_efo_spark.operators.sampling import (
        ngram_lm_fit,
        ngram_lm_score,
    )

    lm = ngram_lm_fit(d.where(F.col("lang") == "en"), "text",
                      num_buckets=256)
    return ngram_lm_score(d, "doc_id", "text", lm, num_buckets=256).agg(
        F.sum("sum_micro_logp")).collect()


def _probe(d):
    from flink_efo_spark.operators.text import (
        logistic_probe_scores,
        quality_stats,
    )

    qs = quality_stats(d, "doc_id", "text")
    labeled = qs.join(
        d.select("doc_id", (F.col("lang") == "en").cast("int").alias("y")),
        "doc_id",
    )
    return logistic_probe_scores(
        labeled, "doc_id", "y", ("stopword_ratio", "quality_score")
    ).agg(F.sum("logit")).collect()


def _mix(d):
    from flink_efo_spark.operators.sampling import (
        apply_mixture_plan,
        domain_mixture_plan,
    )

    targets = {f"src{i}": 0.03 for i in range(0, 20, 2)}
    plan = domain_mixture_plan(d, "source", "text", targets)
    return apply_mixture_plan(d, "doc_id", "source", plan).count()


def _v4(d):
    from flink_efo_spark.operators.packing import pack_sequences
    from flink_efo_spark.operators.sampling import (
        apply_mixture_plan,
        domain_mixture_plan,
    )
    from flink_efo_spark.operators.text import (
        decontaminate,
        gopher_repetition_flags,
    )

    targets = {f"src{i}": 0.03 for i in range(0, 20, 2)}
    corpus = d.where(F.col("doc_id") % 97 != 0).select(
        "doc_id", "source", "text")
    ev = d.where(F.col("doc_id") % 97 == 0)
    clean = decontaminate(corpus, ev, "doc_id", "text")
    keep = gopher_repetition_flags(clean, "doc_id", "text").where(
        "keep").select("doc_id")
    filtered = clean.join(keep, "doc_id")
    plan = domain_mixture_plan(filtered, "source", "text", targets)
    balanced = apply_mixture_plan(filtered, "doc_id", "source", plan)
    return pack_sequences(balanced, "doc_id", "text", seq_len=64).agg(
        F.sum("seg_len")).collect()


def _terciles(d):
    from flink_efo_spark.operators.sampling import (
        ngram_lm_fit,
        ngram_lm_score,
        score_terciles,
    )

    lm = ngram_lm_fit(d.where(F.col("lang") == "en"), "text",
                      num_buckets=256)
    scores = ngram_lm_score(d, "doc_id", "text", lm, num_buckets=256)
    return score_terciles(
        scores.select("doc_id", "cross_entropy"), "doc_id",
        "cross_entropy",
    ).groupBy("bucket").count().collect()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("tenx-curation")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"load1_before {os.getloadavg()[0]:.1f}")

    docs1 = load_table(spark, sf_dir, "documents").localCheckpoint(eager=True)
    emb1 = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    docs10 = _copies(docs1, "doc_id").localCheckpoint(eager=True)
    emb10 = _copies(emb1, "vec_id").localCheckpoint(eager=True)
    print(f"docs {docs1.count()} -> {docs10.count()}, "
          f"emb {emb1.count()} -> {emb10.count()}")

    # (name, fn(docs, emb, k)) — k is the semantic-dedup cluster count,
    # scaled with the corpus (the operator's documented 100 TB knob:
    # constant EXPECTED cluster size keeps the per-cluster pairwise
    # pass linear in total rows). The fixed-k row is kept as the
    # honest contrast: 10x rows in the same clusters = 100x pairs.
    cases = [
        ("semantic_dedup (k scaled 8->80)", lambda d, e, k: semantic_dedup(
            e, "vec_id", n_clusters=k, threshold=0.3).count()),
        ("semantic_dedup (k FIXED 8)", lambda d, e, k: semantic_dedup(
            e, "vec_id", n_clusters=8, threshold=0.3).count()),
        ("dsir_sample", lambda d, e, k: dsir_sample(
            d, "doc_id", "text", d.where(F.col("lang") == "en"),
            n=50, num_buckets=512).count()),
        ("duplicate_spans", lambda d, e, k: duplicate_spans(
            d, "doc_id", "text", window=6).count()),
        # filter before count so the per-doc join cannot be eliminated
        # by the left-join cardinality rule — forces the real compute
        ("span_dup_stats", lambda d, e, k: span_dup_stats(
            d, "doc_id", "text", window=6)
            .where(F.col("dup_windows") > 0).count()),
        # round-10 additions: span remediation + token budgeting +
        # calibration (aggregates force the full compute past pruning)
        ("duplicate_span_positions", lambda d, e, k: _r10()
            .duplicate_span_positions(d, "doc_id", "text", window=6)
            .where(F.col("token_end") > 0).count()),
        ("cut_duplicate_spans", lambda d, e, k: _r10()
            .cut_duplicate_spans(d, "doc_id", "text", window=6)
            .agg(F.sum("removed_tokens")).collect()),
        ("bpe_token_estimate", lambda d, e, k: _r10t()
            .bpe_token_estimate(d, "doc_id", "text")
            .agg(F.sum("bpe_est_tokens")).collect()),
        ("pack_shards_bpe", lambda d, e, k: _r10p()
            .pack_shards(d, "doc_id", "text", 4000, counter="bpe_estimate")
            .agg(F.max("shard_id")).collect()),
        ("quality_logistic_probe", lambda d, e, k: _probe(d)),
        ("ngram_lm_score", lambda d, e, k: _lm(d)),
        ("gopher_quality_flags", lambda d, e, k: _r10t()
            .gopher_quality_flags(d, "doc_id", "text")
            .where(F.col("keep")).count()),
        ("c4_clean", lambda d, e, k: _r10t()
            .c4_clean(d, "doc_id", "text")
            .agg(F.sum("kept_lines")).collect()),
        # round-10b additions: the Gopher repetition half, domain
        # reweighting, sequence packing, and the funnel report
        ("gopher_repetition_flags", lambda d, e, k: _r10t()
            .gopher_repetition_flags(d, "doc_id", "text")
            .where(F.col("keep")).count()),
        ("domain_mixture_plan+apply", lambda d, e, k: _mix(d)),
        ("pack_sequences", lambda d, e, k: _r10p()
            .pack_sequences(d, "doc_id", "text", seq_len=64)
            .agg(F.sum("seg_len")).collect()),
        ("curation_funnel_report", lambda d, e, k: _r10t()
            .curation_funnel_report(d, "doc_id", "text").collect()),
        ("boilerplate_topk", lambda d, e, k: _r10()
            .boilerplate_topk(d, "doc_id", "text", window=6, k=50)
            .agg(F.sum("n_occurrences")).collect()),
        ("decontaminate", lambda d, e, k: _r10t().decontaminate(
            d.where(F.col("doc_id") % 97 != 0),
            d.where(F.col("doc_id") % 97 == 0),
            "doc_id", "text").count()),
        ("ccnet_lm_buckets (fit+score+terciles)",
         lambda d, e, k: _terciles(d)),
        ("tfidf_top_terms", lambda d, e, k: _r10t()
            .tfidf_top_terms(d, "doc_id", "text", k=5)
            .agg(F.sum("score_micro")).collect()),
        ("vocab_stats", lambda d, e, k: _r10t()
            .vocab_stats(d, "source", "text").collect()),
        ("curation_pipeline_v4", lambda d, e, k: _v4(d)),
    ]
    only = [a for a in sys.argv[2:]]
    if only:
        cases = [c for c in cases if any(s in c[0] for s in only)]
    for name, fn in cases:
        t1 = _time(lambda: fn(docs1, emb1, 8))
        t10 = _time(lambda: fn(docs10, emb10, 80))
        print(f"{name}: {t1:.2f}s -> {t10:.2f}s ({t10 / t1:.2f}x)")
    print(f"load1_after {os.getloadavg()[0]:.1f}")


if __name__ == "__main__":
    main()
