"""Histogram quantile sketch + Bloom join prefilter invariants
(operators/sketches.py; count-min's live in test_text.py).

The properties that make these safe at 100 TB:
* histogram — merge is cell-wise (per-shard sketches roll up without
  raw data), quantile error is bounded by one bin width, out-of-domain
  values clamp without losing counts;
* bloom — no false negatives (prefilter + join == join exactly), the
  prefilter is broadcast-only on the fact side (no fact shuffle, no
  row duplication), and the dim is scanned once regardless of k.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_efo_spark.operators.sketches import (
    bloom_bits,
    bloom_prefilter,
    bloom_prefilter_join,
    hist_quantiles,
    hist_sketch,
)

from tests.conftest import SF_DIR


def test_hist_quantile_within_one_bin(spark):
    """The true q-quantile value lies inside the reported
    [est_lo, est_hi) bin for every q, and bin choices are monotone
    in q."""
    vals = sorted(((i * 37) % 1000) for i in range(500))
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sk = hist_sketch(df, "v", lo=0, hi=1000, bins=40)
    out = {
        r.q_permille: r
        for r in hist_quantiles(
            sk, [100, 500, 900, 1000], lo=0, hi=1000, bins=40
        ).collect()
    }
    n = len(vals)
    for q, r in out.items():
        rank = -(-q * n // 1000)  # ceil
        true_val = vals[rank - 1]
        assert r.est_lo <= true_val < r.est_hi, (q, true_val, r)
    bins = [out[q].bin for q in sorted(out)]
    assert bins == sorted(bins)


def test_hist_merge_linearity(spark):
    """sketch(A union B) == cell-wise sum of sketch(A) and sketch(B) —
    per-shard / per-day sketches roll up exactly."""
    rows = [((i * 13) % 777,) for i in range(400)]
    df = spark.createDataFrame(rows, "v long")
    a, b = df.where("v < 300"), df.where("v >= 300")
    whole = {
        (r.bin): r.cnt for r in hist_sketch(df, "v", 0, 800, 32).collect()
    }
    merged = (
        hist_sketch(a, "v", 0, 800, 32)
        .unionByName(hist_sketch(b, "v", 0, 800, 32))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    got = {r.bin: r.cnt for r in merged.collect()}
    assert whole == got


def test_hist_clamps_out_of_domain(spark):
    """Values outside [lo, hi) clamp into the edge bins; the sketch
    total still equals the row count."""
    df = spark.createDataFrame(
        [(-50,), (0,), (99,), (100,), (170,)], "v long"
    )
    sk = {r.bin: r.cnt for r in hist_sketch(df, "v", 0, 100, 10).collect()}
    assert sum(sk.values()) == 5
    assert sk[0] == 2  # -50 clamps up into bin 0
    assert sk[9] == 3  # 99 lands in bin 9; 100 and 170 clamp down


def test_bloom_prefilter_join_equals_plain_join(spark):
    """Exactness: bloom_prefilter_join == plain join, row for row
    (no false negatives; false positives die in the join)."""
    fact = spark.createDataFrame(
        [(i % 97, i) for i in range(600)], "k long, fid long"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 97, 9)], "dk long, payload string"
    )
    got = sorted(
        (r.fid, r.payload)
        for r in bloom_prefilter_join(
            fact, dim, "k", "dk", m=512, k=3
        ).collect()
    )
    want = sorted(
        (r.fid, r.payload)
        for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_no_false_negatives_and_selective(spark):
    """Every joining fact row survives the prefilter, the prefilter
    never duplicates rows, and on a selective dim it actually drops
    most of the fact."""
    fact = spark.createDataFrame(
        [(i % 997, i) for i in range(3000)], "k long, fid long"
    )
    dim = spark.createDataFrame([(k,) for k in range(0, 997, 101)], "dk long")
    bits = bloom_bits(dim, "dk", m=2048, k=3)
    pre = bloom_prefilter(fact, bits, "k", m=2048, k=3)
    pre_ids = {r.fid for r in pre.collect()}
    assert len(pre_ids) == pre.count()  # semi joins: no duplication
    match_ids = {
        r.fid for r in fact.join(dim, fact.k == dim.dk, "left_semi").collect()
    }
    assert match_ids <= pre_ids  # no false negatives
    # 10/997 keys join (~30 rows); FP rate at n=10, m=2048, k=3 is
    # well under 1% — deterministic hashes make this a fixed number,
    # the bound just leaves slack
    assert len(pre_ids) < 300


def test_bloom_corpus_plan_prefilters_below_fact_shuffle(spark):
    """The corpus query's physical plan: 3 broadcast LEFT SEMI probes
    sit BELOW the fact's one shuffle (rows drop before the exchange),
    the final join is the merge-hinted SMJ, and the dim key scan for
    the bits happens once (localCheckpoint reuse)."""
    from flink_efo_spark.queries import QUERIES

    df = QUERIES["bloom_prefilter_join"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") == 3
    assert "SortMergeJoin" in plan
    lines = plan.splitlines()
    exch = min(
        i for i, ln in enumerate(lines)
        if "Exchange hashpartitioning(o_custkey" in ln
    )
    semis = [i for i, ln in enumerate(lines) if "LeftSemi" in ln]
    # tree prints parents first: the fact exchange must be an ancestor
    # of (print before) every semi probe
    assert all(exch < s for s in semis), (exch, semis)
    # bits come from the checkpointed RDD, not three fresh dim scans
    assert plan.count("FileScan parquet [c_custkey") == 1


def test_hist_group_quantiles_per_group_correct(spark):
    """Grouped read-back == independent per-group global read-back."""
    from flink_efo_spark.operators.sketches import hist_sketch_by, hist_quantiles_by

    rows = [("a", (i * 37) % 1000) for i in range(300)] + [
        ("b", (i * 13) % 500) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = hist_sketch_by(df, ["g"], "v", 0, 1000, 40)
    out = {
        (r.g, r.q_permille): (r.bin, r.est_lo, r.est_hi)
        for r in hist_quantiles_by(
            sk, ["g"], [500, 900], 0, 1000, 40
        ).collect()
    }
    for g in ("a", "b"):
        gdf = df.where(F.col("g") == g)
        gsk = hist_sketch(gdf, "v", 0, 1000, 40)
        solo = {
            r.q_permille: (r.bin, r.est_lo, r.est_hi)
            for r in hist_quantiles(gsk, [500, 900], 0, 1000, 40).collect()
        }
        for q, want in solo.items():
            assert out[(g, q)] == want, (g, q)


def test_bloom_join_rejects_fact_outer_hows(spark):
    """A fact-outer/anti join needs exactly the rows the prefilter
    drops — the operator must refuse instead of silently losing them."""
    import pytest

    fact = spark.createDataFrame([(1, 1)], "k long, fid long")
    dim = spark.createDataFrame([(1,)], "dk long")
    for how in ("left", "full", "left_anti"):
        with pytest.raises(ValueError, match="prefilter drops"):
            bloom_prefilter_join(fact, dim, "k", "dk", how=how)


def test_hist_quantile_interval_contains_true_nondivisible(spark):
    """bins NOT dividing the width (the corpus's own 10500000/220
    shape): est_hi must be the CEILING division so the half-open
    [est_lo, est_hi) interval still contains the bin's whole value
    range — the floor form excluded a bin's max value."""
    import math

    from flink_efo_spark.operators.sketches import hist_quantiles, hist_sketch

    lo, hi, bins = 0, 1000, 7  # width 1000/7 = 142.857...
    vals = [(v,) for v in range(0, 1000, 3)]
    df = spark.createDataFrame(vals, "v long")
    sk = hist_sketch(df, "v", lo, hi, bins)
    svals = sorted(v for (v,) in vals)
    for r in hist_quantiles(sk, [1, 500, 999], lo, hi, bins).collect():
        n = len(svals)
        true = svals[math.ceil(r.q_permille * n / 1000) - 1]
        assert r.est_lo <= true < r.est_hi, (r, true)
        # interval covers the whole bin even with a fractional width
        assert r.est_hi - r.est_lo >= (hi - lo) // bins


def test_hist_rejects_bad_domain_and_quantile(spark):
    import pytest

    from flink_efo_spark.operators.sketches import hist_quantiles, hist_sketch

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="2\\^53"):
        hist_sketch(df, "v", 0, 1 << 40, 1 << 20)
    with pytest.raises(ValueError, match="bad histogram domain"):
        hist_sketch(df, "v", 10, 10, 4)
    sk = hist_sketch(df, "v", 0, 10, 2)
    with pytest.raises(ValueError, match="q_permille"):
        hist_quantiles(sk, [0], 0, 10, 2)
    with pytest.raises(ValueError, match="q_permille"):
        hist_quantiles(sk, [1001], 0, 10, 2)


def test_cms_accepts_integer_keys(spark):
    """_h64 casts internally: a BIGINT key column must build and read
    back without the caller pre-casting (parity with bloom_bits)."""
    from flink_efo_spark.operators.sketches import cms_estimate, cms_sketch

    df = spark.range(0, 300).select((F.col("id") % 7).alias("k"))
    sk = cms_sketch(df, "k", depth=4, width=64)
    est = {
        r.k: r.est_cnt
        for r in cms_estimate(sk, df.select("k").distinct(), "k", 4, 64).collect()
    }
    for k in range(7):
        assert est[k] >= 300 // 7


def test_bloom_prefilter_fact_with_pos_column(spark):
    """A fact table carrying its own 'pos' column must not collide
    with the broadcast bit relation's position column."""
    from flink_efo_spark.operators.sketches import bloom_bits, bloom_prefilter

    dim = spark.range(0, 50).select(F.col("id").alias("k"))
    fact = spark.range(0, 200).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("pos")
    )
    bits = bloom_bits(dim, "k")
    out = bloom_prefilter(fact, bits, "k")
    kept = {r.k for r in out.collect()}
    assert set(range(50)) <= kept  # no false negatives


def test_bucketed_join_right_outer_keeps_key(spark, tmp_path):
    """Unmatched right rows must keep their join key (coalesced from
    the renamed right column) instead of a NULL key."""
    from flink_efo_spark.operators.layout import bucketed_join, write_bucketed

    l = spark.createDataFrame([(1, "a"), (2, "b")], "k long, lv string")
    r = spark.createDataFrame([(2, "x"), (99, "y")], "k long, rv string")
    write_bucketed(l, "__bj_l", str(tmp_path / "l"), "k", 4)
    write_bucketed(r, "__bj_r", str(tmp_path / "r"), "k", 4)
    out = bucketed_join(spark, "__bj_l", "__bj_r", "k", how="right")
    got = {(r.k, r.lv, r.rv) for r in out.collect()}
    assert got == {(2, "b", "x"), (99, None, "y")}
