"""Text-analysis operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_efo_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    ngram_contamination,
    normalize_text,
    pii_scrub,
    quality_stats,
    token_stats,
)

DOCS = [
    (1, "the quick brown fox is in the barn for it"),
    (2, "der hund ist nicht mit der katze und das ist gut"),
    (3, "12345 !!! ???"),
    (4, ""),
]
SCHEMA = "doc_id int, text string"


def test_token_stats(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    rows = {r.doc_id: r for r in token_stats(df, "doc_id", "text").collect()}
    assert rows[1].n_tokens == 10
    assert rows[1].n_types == 9  # 'the' twice
    assert rows[4].n_tokens == 0
    assert rows[3].bpe_tokens == 7  # one number run + 6 punct chars


def test_lang_id(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    rows = {r.doc_id: r.lang_guess for r in lang_id(df, "doc_id", "text").collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "und" and rows[4] == "und"


def test_quality_stats_bounds(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    for r in quality_stats(df, "doc_id", "text").collect():
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0


def test_normalize_text_collapses_variants(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "HELLO--WORLD"), (4, "")],
        SCHEMA,
    )
    rows = {r.doc_id: r for r in normalize_text(df, "doc_id", "text").collect()}
    assert rows[1].norm_text == "hello world"
    assert rows[1].norm_hash == rows[2].norm_hash == rows[3].norm_hash
    assert rows[4].norm_text == ""


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io or b@y.org, call +1-555-0199"),
            (2, "server at 192.168.0.1 and 10.0.0.255"),
            (3, "nothing sensitive here"),
        ],
        SCHEMA,
    )
    rows = {r.doc_id: r for r in pii_scrub(df, "doc_id", "text").collect()}
    assert rows[1].n_emails == 2 and rows[1].n_phones == 1
    assert rows[2].n_ips == 2
    assert rows[3].n_emails == rows[3].n_phones == rows[3].n_ips == 0
    assert all(r.n_residual == 0 for r in rows.values())


def test_ngram_contamination_flags_only_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat today"),
            (2, "completely unrelated words entirely different"),
        ],
        SCHEMA,
    )
    eval_df = spark.createDataFrame([(100, "cat sat on the mat")], SCHEMA)
    rows = {
        r.doc_id: r.hit_ngrams
        for r in ngram_contamination(corpus, eval_df, "doc_id", "text").collect()
    }
    # doc 1 shares 3-grams ("cat sat on", "sat on the", "on the mat"); doc 2 none
    assert rows == {1: 3}


def test_doc_fingerprint_equal_docs_share_min(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z z z q q")],
        SCHEMA,
    )
    rows = {r.doc_id: r.fp_min for r in doc_fingerprint(df, "doc_id", "text").collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_bm25_matches_reference_formula(spark, ddb):
    """BM25 against a hand-computed single-doc check plus the global
    invariant that adding an extra occurrence of a query term never
    lowers a document's score (tf monotonicity)."""
    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.text import bm25_scores
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    out = bm25_scores(docs, "doc_id", "text", ["scan", "merge"]).collect()
    assert all(r.bm25 > 0 for r in out)
    # tf monotonicity: duplicate a doc's text and re-score — the
    # duplicated doc (2x dl, 2x tf of every term) must score within
    # [original, saturating bound], i.e. still positive and finite
    import math

    for r in out[:10]:
        assert math.isfinite(r.bm25)


def test_cms_guarantee_and_linearity(spark):
    """Count-min invariants: estimates never undercount (one-sided
    error), and the sketch is linear — sketch(A union B) equals the
    cell-wise sum of sketch(A) and sketch(B), the property that makes
    per-shard / per-window sketches roll up without raw data."""
    from pyspark.sql import functions as F

    from flink_efo_spark.operators.sketches import cms_estimate, cms_sketch

    rows = [(i, f"k{i % 17}") for i in range(400)] + [
        (400 + i, "hot") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "i long, k string")
    sk = cms_sketch(df, "k", depth=4, width=32)
    keys = df.select("k").distinct()
    est = {r.k: r.est_cnt for r in cms_estimate(sk, keys, "k", 4, 32).collect()}
    exact = {r.k: r.cnt for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    for k, c in exact.items():
        assert est[k] >= c, f"undercount for {k}"
    assert est["hot"] >= 60

    a, b = df.where("i < 230"), df.where("i >= 230")
    ska = cms_sketch(a, "k", depth=4, width=32)
    skb = cms_sketch(b, "k", depth=4, width=32)
    merged = (
        ska.unionByName(skb).groupBy("j", "w").agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r.j, r.w): r.cnt for r in sk.collect()}
    got = {(r.j, r.w): r.cnt for r in merged.collect()}
    assert whole == got


def test_mixture_sample_rates_and_determinism(spark):
    from flink_efo_spark.operators.sampling import mixture_sample

    df = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = mixture_sample(df, "doc_id", "lang", {"en": 0.5}, default_rate=0.1)
    rows = out.groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in rows}
    # 10k per lang: en ~5000, de ~1000 (hash-uniform within ~5%)
    assert abs(got["en"] - 5000) < 250 and abs(got["de"] - 1000) < 150
    # deterministic: the same rows on a re-draw
    again = mixture_sample(df, "doc_id", "lang", {"en": 0.5}, default_rate=0.1)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )
    with pytest.raises(ValueError, match="out of"):
        mixture_sample(df, "doc_id", "lang", {"en": 1.5})


def test_token_budget_sample_reaches_budget(spark):
    from flink_efo_spark.operators.sampling import token_budget_sample

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") % 7 + 1).cast("long").alias("toks"),
    )
    out = token_budget_sample(df, "doc_id", "lang", "toks",
                              {"en": 100, "de": 40})
    sums = {r.lang: r.total for r in
            out.groupBy("lang").agg(F.sum("toks").alias("total")).collect()}
    # reaches the budget; crossing doc included, so < budget + max(toks)
    assert 100 <= sums["en"] < 107 and 40 <= sums["de"] < 47
    # deterministic re-draw
    again = token_budget_sample(df, "doc_id", "lang", "toks",
                                {"en": 100, "de": 40})
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_token_budget_sample_bucketed_plan_and_naive_parity(spark):
    """The 100 TB guard (r6 verdict #2): the per-group cumsum must NOT
    run as one window partitioned by the group alone (one task per
    group). The plan's data-path window partitions on
    (group, hex-bucket) — 2×256 partitions here — and the only
    group-only window runs over the ≤n_buckets-per-group TOTALS rows.
    The admitted set stays bit-identical to the naive single-window
    formulation."""
    from pyspark.sql import Window

    from flink_efo_spark.operators.sampling import token_budget_sample

    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        (F.col("id") % 7 + 1).cast("long").alias("toks"),
    )
    out = token_budget_sample(df, "doc_id", "lang", "toks",
                              {"en": 300, "de": 120})
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the row-data window carries the bucket key next to the group key
    assert "windowexpression" not in plan.lower() or "__bucket" in plan
    import re as _re

    for m in _re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        part_keys = m.group(1)
        if "__bucket" not in part_keys:
            # group-only window: legal ONLY on the totals side, whose
            # frame sums __tot (bounded by n_buckets rows per group)
            assert "__tot" in m.group(0)

    # naive single-window reference: identical admitted set
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = F.when(F.col("lang") == "en", 300).when(F.col("lang") == "de", 120)
    naive = (
        df.withColumn("__cum", F.sum("toks").over(w))
        .withColumn("__b", budget)
        .where(F.col("__b").isNotNull()
               & (F.col("__cum") - F.col("toks") < F.col("__b")))
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in naive.collect()
    )

    with pytest.raises(ValueError, match="at least one group"):
        token_budget_sample(df, "doc_id", "lang", "toks", {})
    with pytest.raises(ValueError, match=">= 0"):
        token_budget_sample(df, "doc_id", "lang", "toks", {"en": -1})


def test_token_budget_sample_null_id_retained(spark):
    """A NULL id must not silently fall out of the (group, bucket)
    equi-join: it gets the empty order key (sorts first) and counts
    against its group's budget."""
    from flink_efo_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(None, "en", 5), (1, "en", 5), (2, "en", 5)],
        "doc_id int, lang string, toks long",
    )
    out = token_budget_sample(df, "doc_id", "lang", "toks", {"en": 8})
    rows = sorted((r.doc_id is None, r.doc_id) for r in out.collect())
    # budget 8: the NULL-id doc (key '') is drawn first, then ONE of
    # the hashed ids crosses the boundary
    assert len(rows) == 2 and rows[1][0] is True


def test_dsir_weights_exact_bruteforce(spark):
    """dsir_importance vs a literal Python replay: md5-hash64 buckets
    over unigrams+bigrams of lower(trim(text)), Laplace-smoothed
    micro-nat log ratios, exact integer sums. weight_micro must match
    EXACTLY (the integer-quantization design's whole point), and be
    invariant under repartitioning."""
    import hashlib
    import math

    from flink_efo_spark.operators.sampling import (
        dsir_importance,
        dsir_log_ratios,
    )

    raw_rows = [
        (1, "the cat sat"),
        (2, "the dog ran far"),
        (3, "stocks fell hard today"),
        (4, "the cat ran"),
        (5, "bonds fell"),
    ]
    tgt_rows = [(10, "the cat ran fast"), (11, "a cat sat")]
    B, alpha = 64, 1.0
    raw = spark.createDataFrame(raw_rows, "doc_id int, text string")
    tgt = spark.createDataFrame(tgt_rows, "doc_id int, text string")

    def grams(text):
        t = text.strip().lower().split(" ")
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    cr, ct = [0] * B, [0] * B
    for _, tx in raw_rows:
        for g in grams(tx):
            cr[bucket(g)] += 1
    for _, tx in tgt_rows:
        for g in grams(tx):
            ct[bucket(g)] += 1
    tr, tt = sum(cr), sum(ct)
    micro = [
        round(
            (math.log((ct[b] + alpha) / (tt + alpha * B))
             - math.log((cr[b] + alpha) / (tr + alpha * B))) * 1e6
        )
        for b in range(B)
    ]
    expected = {
        did: sum(micro[bucket(g)] for g in grams(tx))
        for did, tx in raw_rows
    }

    ratios = dsir_log_ratios(raw, tgt, "text", num_buckets=B, alpha=alpha)
    out = dsir_importance(raw, "doc_id", "text", ratios, num_buckets=B)
    got = {r.doc_id: r.weight_micro for r in out.collect()}
    assert got == expected

    out2 = dsir_importance(
        raw.repartition(5, "doc_id"), "doc_id", "text", ratios, num_buckets=B
    )
    assert {r.doc_id: r.weight_micro for r in out2.collect()} == expected

    # target-like docs must outrank off-target docs
    assert got[1] > got[3] and got[4] > got[5]


def test_dsir_sample_topn_and_guards(spark):
    import pytest

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.sampling import (
        dsir_log_ratios,
        dsir_sample,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    tgt = docs.where("lang = 'en'")
    out = dsir_sample(docs, "doc_id", "text", tgt, n=20, num_buckets=256)
    rows = out.collect()
    assert len(rows) == 20
    # descending weight, ties broken by id
    key = [(-r.weight_micro, r.doc_id) for r in rows]
    assert key == sorted(key)
    # the selected set skews toward the target distribution
    en = {r.doc_id for r in docs.where("lang = 'en'").select("doc_id").collect()}
    frac_sel = sum(r.doc_id in en for r in rows) / len(rows)
    frac_all = docs.where("lang = 'en'").count() / docs.count()
    assert frac_sel > frac_all

    with pytest.raises(ValueError, match="num_buckets"):
        dsir_log_ratios(docs, tgt, "text", num_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        dsir_log_ratios(docs, tgt, "text", alpha=0.0)


def test_bpe_token_estimate_hand_cases(spark):
    """Per-class costs on hand pieces: letters ~len/4 with 1-token
    floor, digit groups of 3, punct runs of 2, contractions 1,
    NULL-safe. The whitespace counter under-charges code/punct — the
    estimator's reason to exist."""
    from flink_efo_spark.operators.text import bpe_token_estimate

    rows = [
        (1, "Hello world"),            # 2 letter pieces -> 1 + 1
        (2, "I don't know"),           # I, don, 't, know -> 4
        (3, "12345678"),               # 8 digits -> ceil(8/3) = 3
        (4, "internationalization"),   # 20 letters -> 23//4 - 1 = 4
        (5, "... !!!"),                # two 3-char punct runs -> 2 + 2
        (6, "x=1;"),                   # 4 pieces -> 4 (ws count: 1)
        (7, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in bpe_token_estimate(
        df, "doc_id", "text").collect()}
    assert got[1].bpe_est_tokens == 2
    assert got[2].bpe_est_tokens == 4
    assert got[3].bpe_est_tokens == 3
    assert got[4].bpe_est_tokens == 4
    assert got[5].bpe_est_tokens == 4
    assert got[6].bpe_est_tokens == 4 and got[6].ws_tokens == 1
    assert got[7].bpe_est_tokens is None and got[7].n_pieces is None


def test_pack_shards_bpe_counter(spark):
    """counter='bpe_estimate' swaps the token metric; layout
    invariants (contiguous start_pos, shard budget bound) hold; bad
    counter rejected."""
    import pytest

    from flink_efo_spark.catalog import load_table
    from flink_efo_spark.operators.packing import pack_shards
    from flink_efo_spark.operators.text import bpe_token_estimate
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    out = pack_shards(
        docs, "doc_id", "text", shard_tokens=4000, counter="bpe_estimate"
    ).collect()
    est = {
        r.doc_id: r.bpe_est_tokens
        for r in bpe_token_estimate(docs, "doc_id", "text").collect()
    }
    assert {r.doc_id: r.n_tokens for r in out} == {
        k: (v or 0) for k, v in est.items()
    }
    laid = sorted(out, key=lambda r: r.start_pos)
    pos = 0
    for r in laid:
        assert r.start_pos == pos
        assert r.shard_id == r.start_pos // 4000
        pos += r.n_tokens

    with pytest.raises(ValueError, match="counter"):
        pack_shards(docs, "doc_id", "text", 4000, counter="words")


def test_logistic_probe_scores(spark):
    """One-step-Newton probe: separable labels get higher logits for
    the positive class; exact-integer sufficient statistics make the
    output partitioning-invariant bit-for-bit; degenerate inputs
    raise."""
    import pytest

    from flink_efo_spark.operators.text import logistic_probe_scores

    rows = [
        (i, 1, 0.8 + (i % 3) * 0.01, 0.1 + (i % 2) * 0.01)
        for i in range(20)
    ] + [
        (100 + i, 0, 0.1 + (i % 3) * 0.01, 0.8 + (i % 2) * 0.01)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id int, y int, f1 double, f2 double")
    got = {r.doc_id: r.logit for r in logistic_probe_scores(
        df, "doc_id", "y", ("f1", "f2")).collect()}
    pos = [got[i] for i in range(20)]
    neg = [got[100 + i] for i in range(20)]
    assert min(pos) > max(neg)

    got2 = {r.doc_id: r.logit for r in logistic_probe_scores(
        df.repartition(7, "doc_id"), "doc_id", "y", ("f1", "f2")
    ).collect()}
    assert got == got2  # exact equality, not approx

    const = spark.createDataFrame(
        [(1, 1, 0.5, 0.5), (2, 0, 0.5, 0.5)],
        "doc_id int, y int, f1 double, f2 double",
    )
    with pytest.raises(ValueError, match="singular"):
        logistic_probe_scores(const, "doc_id", "y", ("f1", "f2"))
    with pytest.raises(ValueError, match="quant"):
        logistic_probe_scores(df, "doc_id", "y", ("f1", "f2"), quant=0)


def test_ngram_lm_exact_bruteforce(spark):
    """ngram_lm_fit / ngram_lm_score vs a literal Python replay:
    md5-hash64 buckets, Laplace-smoothed conditional bigram counts,
    micro-nat quantization, exact integer per-doc sums. Also the
    guards: spine-size contract, degenerate smoothing."""
    import hashlib
    import math

    import pytest

    from flink_efo_spark.operators.sampling import (
        ngram_lm_fit,
        ngram_lm_score,
    )

    B, alpha = 16, 1.0
    target_rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "a cat and a dog"),
    ]
    score_rows = target_rows + [
        (4, "zebra quagga xylophone"),
        (5, "single"),          # < 2 tokens -> no bigrams
        (6, None),              # excluded
    ]
    tgt = spark.createDataFrame(target_rows, "doc_id int, text string")
    docs = spark.createDataFrame(score_rows, "doc_id int, text string")

    lm = ngram_lm_fit(tgt, "text", num_buckets=B, alpha=alpha)
    got_lm = {(r.b1, r.b2): r.micro_logp for r in lm.collect()}
    assert len(got_lm) == B * B

    def bk(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % B

    def bigrams(t):
        toks = t.strip().lower().split(" ")
        return list(zip(toks, toks[1:]))

    counts: dict = {}
    for _, t in target_rows:
        for a, b in bigrams(t):
            counts[(bk(a), bk(b))] = counts.get((bk(a), bk(b)), 0) + 1
    ctx: dict = {}
    for (b1, _), c in counts.items():
        ctx[b1] = ctx.get(b1, 0) + c
    for b1 in range(B):
        for b2 in range(B):
            c = counts.get((b1, b2), 0)
            cc = ctx.get(b1, 0)
            want = round(
                math.log((c + alpha) / (cc + alpha * B)) * 1_000_000
            )
            assert got_lm[(b1, b2)] == want, (b1, b2)

    got = {r.doc_id: r for r in ngram_lm_score(
        docs, "doc_id", "text", lm, num_buckets=B).collect()}
    assert sorted(got) == [1, 2, 3, 4, 5]  # NULL text excluded
    for did, t in score_rows[:5]:
        if t is None:
            continue
        bgs = bigrams(t)
        want_sum = sum(got_lm[(bk(a), bk(b))] for a, b in bgs)
        assert got[did].n_bigrams == len(bgs)
        assert got[did].sum_micro_logp == (want_sum if bgs else 0)
        if bgs:
            assert got[did].cross_entropy == round(
                -want_sum / 1_000_000.0 / len(bgs), 6
            )
        else:
            assert got[did].cross_entropy is None
    # junk text scores worse (higher cross-entropy) than target text
    assert got[4].cross_entropy > got[1].cross_entropy

    with pytest.raises(ValueError, match="num_buckets"):
        ngram_lm_score(docs, "doc_id", "text", lm, num_buckets=32)
    with pytest.raises(ValueError, match="alpha"):
        ngram_lm_fit(tgt, "text", num_buckets=B, alpha=0.0)


def test_gopher_quality_flags(spark):
    """Hand-built violations, one per rule; exact-integer thresholds.
    The good doc passes everything; each bad doc fails exactly the
    targeted rule (plus any it also genuinely violates)."""
    from flink_efo_spark.operators.text import gopher_quality_flags

    good = ("the quick brown fox jumps over the lazy dog and then "
            "that same fox decided to have another run with friends "
            "over the hill because it was a fine day to be outside "
            "running and playing games with all of the other animals "
            "in the field near the old barn by the river bank today")
    rows = [
        (1, good),                                  # passes all
        (2, "too short to have fifty words"),       # word count
        (3, " ".join(["supercalifragilistic"] * 60)),  # mean len > 10
        (4, good + " " + "#" * 1 + " #### ### ## # # # # # # # # # "
            "# # # # # # # # # # # # # #"),         # symbol ratio
        (5, "\n".join(["- bullet item " + str(i) for i in range(10)])),
        (6, good.replace(" today", "") + "\n" +
            "\n".join([f"line {i} trails off..." for i in range(9)])),
        (7, " ".join(["12345"] * 60)),              # alpha + stopwords
        (8, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in gopher_quality_flags(
        df, "doc_id", "text").collect()}

    assert got[1].keep and all(
        got[1][c] for c in got[1].asDict() if c.startswith("ok_"))
    assert not got[2].ok_word_count and not got[2].keep
    assert not got[3].ok_mean_word_len and not got[3].keep
    assert not got[4].ok_symbol_ratio and not got[4].keep
    assert not got[5].ok_bullet_lines and not got[5].keep
    assert not got[6].ok_ellipsis_lines and not got[6].keep
    assert not got[7].ok_alpha_words and not got[7].ok_stopwords
    assert got[8].n_words == 0 and not got[8].keep
    assert not any(got[8][c] for c in got[8].asDict()
                   if c.startswith("ok_"))


def test_c4_clean(spark):
    """C4 line/page rules on hand-built pages: surviving lines keep
    order and rejoin exactly; page flags and the 3-sentence floor
    gate keep."""
    from flink_efo_spark.operators.text import c4_clean

    good_line = "this line has plenty of words and ends properly."
    rows = [
        (1, "\n".join([good_line, "short line.",            # < 5 words
                       "no terminal punctuation here at all",
                       "enable javascript to view this page.",
                       "another proper sentence with enough words!",
                       "a third full sentence to pass the floor?"])),
        (2, good_line + " { code }"),                        # brace
        (3, "Lorem Ipsum dolor sit amet filler text here."), # lorem
        (4, good_line),                                      # 1 sentence
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in c4_clean(df, "doc_id", "text").collect()}

    assert got[1].clean_text == "\n".join(
        [good_line,
         "another proper sentence with enough words!",
         "a third full sentence to pass the floor?"])
    assert (got[1].n_lines, got[1].kept_lines, got[1].n_sentences) == (6, 3, 3)
    assert got[1].keep and not got[1].has_brace and not got[1].has_lorem

    assert got[2].has_brace and not got[2].keep
    assert got[3].has_lorem and not got[3].keep
    assert got[4].kept_lines == 1 and got[4].n_sentences == 1
    assert not got[4].keep                                   # < 3 sentences
    assert got[5].clean_text is None and got[5].n_lines == 0
    assert not got[5].keep


def test_gopher_repetition_flags(spark):
    """Hand-built repetition shapes, one per rule family; exact
    integer metrics hand-checked (dup chars via the total-minus-
    distinct identity, top-gram cover = max count*chars over repeated
    grams)."""
    from flink_efo_spark.operators.text import gopher_repetition_flags

    rows = [
        (1, "a clean doc with several distinct lines\n"
            "another unique line here\nand a third one"),
        (2, "same line\nsame line\nsame line\nsame line"),
        (3, "para one\n\npara one\n\npara one"),
        (4, "spam spam spam spam spam spam spam spam"),
        (5, "one two three four five six " * 5),
        (6, None),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in gopher_repetition_flags(
        df, "doc_id", "text").collect()}

    assert got[1].keep and all(
        got[1][c] for c in got[1].asDict() if c.startswith("ok_"))

    # 3 of 4 lines are repeats; 27 of 36 line chars sit in them
    assert (got[2].dup_lines, got[2].dup_line_chars) == (3, 27)
    assert not got[2].ok_dup_lines and not got[2].ok_dup_line_chars
    assert not got[2].keep

    assert (got[3].dup_paras, got[3].dup_para_chars) == (2, 16)
    assert not got[3].ok_dup_paras and not got[3].ok_dup_para_chars

    # "spam spam" x7 covers 63 chars of a 39-char doc
    assert got[4].top2_cover == 63
    assert not got[4].ok_top2_gram and got[4].ok_dup_lines

    # "three four" x5 is the widest bigram: 10 chars * 5
    assert got[5].top2_cover == 50
    assert got[5].dup6_chars > 0 and not got[5].ok_dup10_gram

    assert got[6].n_chars == 0 and not got[6].keep
    assert not any(got[6][c] for c in got[6].asDict()
                   if c.startswith("ok_"))
    # empty text has nothing repeated: passes the repetition rules
    assert got[7].keep


def test_domain_mixture_plan_and_apply(spark):
    """Plan arithmetic vs a python brute force (exact integer ppm /
    rate_64k), saturation at rate 1, zero-target drop, and the
    hash16 draw matching mixture_sample's."""
    from flink_efo_spark.operators.sampling import (
        apply_mixture_plan,
        domain_mixture_plan,
        mixture_sample,
    )

    rows = [
        (i, g, "tok " * (i % 7 + 1))
        for i, g in enumerate(
            ["a"] * 40 + ["b"] * 30 + ["c"] * 20 + ["d"] * 10
        )
    ]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    targets = {"a": 0.1, "b": 0.5, "c": 0.2}
    plan = domain_mixture_plan(df, "source", "text", targets)
    got = {r.source: r for r in plan.collect()}

    toks = {}
    for _, g, t in rows:
        toks[g] = toks.get(g, 0) + len(t.split())
    total = sum(toks.values())
    ppm = {"a": 100000, "b": 500000, "c": 200000, "d": 0}
    for g, r in got.items():
        assert r.n_tokens == toks[g]
        assert r.natural_ppm == 1_000_000 * toks[g] // total
        assert r.target_ppm == ppm[g]
        want_rate = min(65536, 65536 * ppm[g] * total // (1_000_000 * toks[g]))
        assert r.rate_64k == want_rate, g
        assert r.projected_tokens == toks[g] * want_rate // 65536
    assert got["b"].rate_64k == 65536          # saturates (up-capped)
    assert 0 < got["a"].rate_64k < 65536       # genuine down-sample
    assert got["d"].rate_64k == 0              # unnamed -> dropped

    kept = apply_mixture_plan(df, "doc_id", "source", plan)
    rates = {g: got[g].rate_64k / 65536 for g in got}
    same = mixture_sample(df, "doc_id", "source", rates)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in same.collect()
    )
    assert kept.where(F.col("source") == "d").count() == 0

    import pytest as _pt
    with _pt.raises(ValueError, match="targets"):
        domain_mixture_plan(df, "source", "text", {})
    with _pt.raises(ValueError, match="out of"):
        domain_mixture_plan(df, "source", "text", {"a": 1.5})
    with _pt.raises(ValueError, match="sum"):
        domain_mixture_plan(df, "source", "text", {"a": 0.9, "b": 0.9})
    with _pt.raises(ValueError, match="counter"):
        domain_mixture_plan(df, "source", "text", {"a": 0.5}, counter="x")


def test_curation_funnel_report(spark):
    """Crafted corpus where every stage drops something: a NULL doc,
    a short doc, a degenerate-repetition doc (long enough to pass
    word_count), and an exact duplicate pair. Counts checked exactly
    stage by stage."""
    from flink_efo_spark.operators.text import curation_funnel_report

    good = " ".join(f"w{i}" for i in range(60))        # 60 distinct words
    repet = "badger " * 60                              # fails repetition
    rows = [
        (1, good),
        (2, good),                                      # exact dup of 1
        (3, "too short"),
        (4, repet),
        (5, None),
        (6, " ".join(f"x{i}" for i in range(55))),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.stage_idx: r for r in curation_funnel_report(
        df, "doc_id", "text").collect()}

    assert [got[k].stage for k in range(1, 5)] == [
        "text_present", "word_count", "gopher_repetition", "exact_dedup"]
    assert (got[1].docs_in, got[1].docs_out) == (6, 5)   # NULL dropped
    assert (got[2].docs_in, got[2].docs_out) == (5, 4)   # short dropped
    assert (got[3].docs_in, got[3].docs_out) == (4, 3)   # repetition
    assert (got[4].docs_in, got[4].docs_out) == (3, 2)   # dup dropped
    assert got[4].tokens_out == 60 + 55
    # chain invariant: docs_in of stage k+1 == docs_out of stage k
    for k in range(1, 4):
        assert got[k + 1].docs_in == got[k].docs_out


def test_decontaminate(spark):
    """The transform drops exactly the docs ngram_contamination
    flags above max_hits, keeps original columns, and max_hits
    loosens the cut."""
    from flink_efo_spark.operators.text import (
        decontaminate,
        ngram_contamination,
    )

    ev = spark.createDataFrame(
        [(100, "the secret benchmark answer is forty two")],
        "doc_id int, text string")
    rows = [
        (1, "the secret benchmark answer is forty two plus context"),
        (2, "a single overlap the secret benchmark here only"),
        (3, "completely clean document with no overlap at all"),
        (4, None),
    ]
    corpus = spark.createDataFrame(rows, "doc_id int, text string")

    kept0 = decontaminate(corpus, ev, "doc_id", "text").collect()
    assert sorted(r.doc_id for r in kept0) == [3, 4]
    assert {c for r in kept0 for c in r.asDict()} == {"doc_id", "text"}

    hits = {r.doc_id: r.hit_ngrams for r in ngram_contamination(
        corpus, ev, "doc_id", "text").collect()}
    loose = decontaminate(
        corpus, ev, "doc_id", "text", max_hits=hits[2]).collect()
    assert sorted(r.doc_id for r in loose) == [2, 3, 4]

    import pytest as _pt
    with _pt.raises(ValueError, match="max_hits"):
        decontaminate(corpus, ev, "doc_id", "text", max_hits=-1)


def test_score_terciles(spark):
    """Value-tercile bucketing: known scores land in the right
    buckets, NULLs fall to tail, equal thirds on a uniform ladder,
    and the <= cut semantics keep boundary rows in the lower
    bucket."""
    from flink_efo_spark.operators.sampling import score_terciles

    rows = [(i, float(i)) for i in range(1, 10)] + [(99, None)]
    df = spark.createDataFrame(rows, "doc_id int, score double")
    got = {r.doc_id: r.bucket for r in score_terciles(
        df, "doc_id", "score").collect()}

    # cuts for 1..9: p1/3 at pos 8/3 -> 3.667, p2/3 at 6.333 (rounded
    # 6dp) — <= keeps 1,2,3 in head; 4,5,6 in middle; 7,8,9 in tail
    assert [got[i] for i in range(1, 10)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3)
    assert got[99] == "tail"

    custom = score_terciles(
        df, "doc_id", "score", labels=("a", "b", "c")).collect()
    assert {r.bucket for r in custom} == {"a", "b", "c"}


def test_tfidf_top_terms(spark):
    """tf-idf vs a python brute force with the same micro-nat idf
    quantization; rank order and the <= k cut; ties break by term."""
    import math

    from flink_efo_spark.operators.text import tfidf_top_terms

    rows = [
        (1, "apple apple banana cherry"),
        (2, "banana banana banana date"),
        (3, "cherry date egg egg egg fig"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = tfidf_top_terms(df, "doc_id", "text", k=2).collect()

    docs = {i: t.split() for i, t in rows}
    n = len(docs)
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    expect = {}
    for i, toks in docs.items():
        scored = sorted(
            (
                -toks.count(t)
                * round(math.log((n + 1) / (dfreq[t] + 1)) * 1_000_000),
                t,
            )
            for t in set(toks)
        )[:2]
        expect[i] = [(t, -s) for s, t in scored]
    for r in got:
        t, s = expect[r.doc_id][r.rank - 1]
        assert (r.term, r.score_micro) == (t, s), r

    import pytest as _pt
    with _pt.raises(ValueError, match="k must"):
        tfidf_top_terms(df, "doc_id", "text", k=0)


def test_vocab_stats(spark):
    """Exact vocabulary numbers on a hand corpus: token totals,
    vocab size, hapax count, and the deterministic mode (max count,
    least term on ties)."""
    from flink_efo_spark.operators.text import vocab_stats

    rows = [
        ("a", "x x y z"),
        ("a", "x w"),
        ("b", "p q p q"),   # tie p/q -> least term p wins
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.source: r for r in vocab_stats(df, "source", "text").collect()}

    assert (got["a"].n_tokens, got["a"].vocab_size,
            got["a"].hapax_terms) == (6, 4, 3)  # x:3, y/z/w hapax
    assert (got["a"].top_term, got["a"].top_term_count) == ("x", 3)
    assert (got["b"].top_term, got["b"].top_term_count) == ("p", 2)
