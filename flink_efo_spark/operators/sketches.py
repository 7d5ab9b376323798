"""Mergeable sketches: fixed-size summaries whose builds are one
bounded-shuffle pass and whose merges are cell-wise — count-min
(frequencies), equi-width histograms (quantiles), and Bloom filters
(membership / join prefilters).

A §2.15 beyond-reference extension family alongside the corpus's HLL
distinct rollups (queries.py q_hll_distinct_rollup): where HLL answers
"how many distinct", count-min answers "how often does THIS key occur"
in O(depth x width) memory with a one-sided error — estimates never
undercount, and overcount by at most eps*N with probability 1-delta
(Cormode & Muthukrishnan 2005; width = ceil(e/eps), depth =
ceil(ln 1/delta)); the histogram answers "what value sits at quantile
q" with error bounded by one bin width; the Bloom filter answers "can
this key possibly join" with no false negatives.

Scale shape: the sketch build is ONE pass — depth (j, w) cells per
row, aggregated with map-side combine, so the shuffle carries at most
depth x width x partitions combiner rows regardless of input size; the
finished sketch is depth x width rows (KBs) and broadcasts into any
lookup join. Merging shards/windows is cell-wise addition (the sketch
is a linear transform of the input), so per-partition or per-window
sketches roll up without touching raw data again.

Determinism: the row hash is the corpus's portable md5 idiom
(first 15 hex chars -> BIGINT — identical in Spark and DuckDB), and
the depth hash functions are fixed affine maps modulo a 31-bit prime
in exact BIGINT arithmetic — so the whole sketch is bit-identical
across engines, partitionings, and row orders, and a DuckDB oracle
can rebuild it cell-for-cell.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit prime: h % P < 2^31, A[j] < 2^5 => A[j]*h' + B[j] < 2^37,
# exact in BIGINT on both engines (no overflow, no float)
P = 1_000_000_007
A = (3, 7, 11, 13, 17, 19, 23, 29)
B = (1, 5, 9, 15, 21, 27, 33, 39)


def _h64(col: Column) -> Column:
    """Portable string->int hash (dedup.py's md5 idiom). Casts to
    string internally — md5 only auto-casts StringType, so a BIGINT
    key would otherwise fail analysis."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long") % P
    )


def _cell(h: Column, j: int, width: int) -> Column:
    return ((F.lit(A[j]) * h + F.lit(B[j])) % P) % width


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: returns (j, w, cnt) — depth x width cells
    (absent cells are zero). One pass, map-side combine, bounded
    shuffle."""
    assert 1 <= depth <= len(A)
    h = _h64(F.col(key_col))
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("j"),
                    _cell(h, j, width).alias("w"),
                )
                for j in range(depth)
            ]
        )
    ).alias("c")
    return (
        df.select(cells)
        .select("c.j", "c.w")
        .groupBy("j", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for a key relation: est = min_j sketch[j][h_j]
    — the classic count-min read. The sketch side is depth x width
    rows, so it broadcasts; missing cells count as zero via the
    left join + coalesce."""
    h = _h64(F.col(key_col))
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("long").alias("j"),
                        _cell(h, j, width).alias("w"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.j", "c.w")
    return (
        probes.join(F.broadcast(sketch), ["j", "w"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt"))
    )


# ---------------------------------------------------------------------------
# Equi-width histogram sketch: deterministic mergeable quantiles
# ---------------------------------------------------------------------------
#
# Spark's approx_percentile is also one-pass and mergeable, but its
# summary is opaque and engine-specific — two engines (or two Spark
# versions) can answer differently on the same data. The equi-width
# histogram trades adaptivity for portability: with a declared value
# domain [lo, hi) and an integer value column, every step is exact
# integer/IEEE arithmetic, so the sketch AND its quantile read-back
# are bit-identical across engines, partitionings, and row orders —
# a DuckDB oracle rebuilds both. Quantile error is bounded by one bin
# width ((hi - lo) / bins), the classic fixed-histogram guarantee.
#
# Scale shape: the build is one pass with map-side combine; the
# shuffle carries at most `bins` combiner rows per input partition and
# the finished sketch is <= bins rows (KBs). Merging shards / windows
# / days is cell-wise addition on bin — no raw data touched. The
# quantile read-back runs entirely on the <= bins-row sketch (the
# single-partition windows below see only sketch rows, never data).


def _check_domain(lo: int, hi: int, bins: int) -> None:
    """The exactness contract: the clamped product (hi-lo)*bins must
    stay under 2^53 so the single IEEE division's floor is exact
    (operands exactly representable; a true quotient just below an
    integer sits >= 1/(hi-lo) away while the division error is
    ~quotient * 2^-53). Wider domains must coarsen the grid."""
    if hi <= lo or bins < 1:
        raise ValueError(f"bad histogram domain: [{lo}, {hi}) x {bins}")
    if (hi - lo) * bins >= 1 << 53:
        raise ValueError(
            f"(hi - lo) * bins = {(hi - lo) * bins} >= 2^53 breaks the "
            "exact-binning contract — use fewer bins or a coarser grid"
        )


def _bin_expr(value: str | Column, lo: int, hi: int, bins: int) -> Column:
    """bin = floor((clamp(v) - lo) * bins / (hi - lo)) clamped to
    [0, bins-1]. The value is clamped into [lo, hi] BEFORE the
    multiply so out-of-domain extremes land in the edge bins without
    overflowing the BIGINT product (the overflow would clamp them to
    the WRONG edge); _check_domain bounds the clamped product. The
    single binning formula shared by the histogram family and
    layout.grid_cell."""
    col = F.col(value) if isinstance(value, str) else value
    v = F.least(
        F.lit(hi).cast("long"),
        F.greatest(F.lit(lo).cast("long"), col.cast("long")),
    )
    raw = F.floor((v - F.lit(lo)) * F.lit(bins) / F.lit(hi - lo))
    return F.least(
        F.lit(bins - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), raw.cast("long")),
    )


def hist_sketch(
    df: DataFrame, value_col: str, lo: int, hi: int, bins: int
) -> DataFrame:
    """Build the histogram: (bin, cnt) with absent bins zero. The
    value column must be integral (snap doubles to a fixed-point
    BIGINT grid first — see queries.py _cents). Out-of-domain values
    clamp into the edge bins, so totals are preserved. The ungrouped
    form of :func:`hist_sketch_by`."""
    return hist_sketch_by(df, [], value_col, lo, hi, bins)


def hist_quantiles(
    sketch: DataFrame,
    q_permille: list[int],
    lo: int,
    hi: int,
    bins: int,
) -> DataFrame:
    """Quantile read-back: for each q (in permille), the first bin
    whose cumulative count reaches ceil(q * N / 1000), with its value
    bounds [est_lo, est_hi) — the true q-quantile lies within that one
    bin. Runs on the <= bins-row sketch only: the unpartitioned
    windows below are deliberate (sketch rows, not data rows), and the
    quantile list is a literal array exploded onto the sketch — no
    join, no BroadcastNestedLoopJoin."""
    return hist_quantiles_by(sketch, [], q_permille, lo, hi, bins)


def hist_sketch_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: int,
    hi: int,
    bins: int,
) -> DataFrame:
    """Per-group histogram: (group..., bin, cnt) — one sketch per
    group key in the same single pass (the groupBy key just widens
    to include bin). Each group's sketch merges/reads back
    independently; this is the per-day / per-shard rollup shape."""
    _check_domain(lo, hi, bins)
    b = _bin_expr(value_col, lo, hi, bins)
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles_by(
    sketch: DataFrame,
    group_cols: list[str],
    q_permille: list[int],
    lo: int,
    hi: int,
    bins: int,
) -> DataFrame:
    """Per-group quantile read-back: :func:`hist_quantiles` with every
    window PARTITIONED BY the group key — no single-partition stage
    at any group count; each partition still holds <= bins rows.
    est_hi is the CEILING division lo + ceil((bin+1)*width / bins), so
    the half-open [est_lo, est_hi) interval always contains the bin's
    whole value range even when bins does not divide the width."""
    from pyspark.sql import Window

    _check_domain(lo, hi, bins)
    for q in q_permille:
        if not (1 <= int(q) <= 1000):
            raise ValueError(f"q_permille out of [1, 1000]: {q}")
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*group_cols)
    qarr = F.array(*[F.lit(int(q)).cast("long") for q in q_permille])
    cum = (
        sketch.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("n", F.sum("cnt").over(w_tot))
        .select(
            *group_cols, F.explode(qarr).alias("q_permille"), "bin", "cum", "n"
        )
    )
    # rank = ceil(q * n / 1000) in EXACT integer arithmetic (BIGINT
    # div) — the IEEE form loses exactness past 2^53 total rows
    rank = F.expr("(q_permille * n + 999) div 1000")
    hit = (
        cum.where(F.col("cum") >= rank)
        .groupBy(*group_cols, "q_permille")
        .agg(F.min("bin").alias("bin"))
    )
    width = hi - lo
    est_lo = (
        F.lit(lo) + F.expr(f"(bin * {width}) div {bins}")
    ).cast("long")
    est_hi = (
        F.lit(lo) + F.expr(f"((bin + 1) * {width} + {bins - 1}) div {bins}")
    ).cast("long")
    return hit.select(
        *group_cols,
        "q_permille",
        "bin",
        est_lo.alias("est_lo"),
        est_hi.alias("est_hi"),
    )


# ---------------------------------------------------------------------------
# Bloom filter: broadcastable membership sketch -> join prefilter
# ---------------------------------------------------------------------------
#
# The runtime-filter idiom for the case AQE's broadcast threshold
# can't save: dim is too big to broadcast (the join must shuffle) but
# its KEY SET fits a KB-scale bit array. Build the dim keys' Bloom
# bits once, broadcast them, and semi-join the fact's k probe
# positions BEFORE the shuffle — fact rows that cannot possibly join
# never enter the exchange. No false negatives (every joining row
# survives the prefilter), and false positives are eliminated by the
# real join that follows, so `prefilter + join == join` exactly; the
# filter only changes how many fact bytes shuffle. Same portable
# md5 + affine-map hashing as the count-min sketch, so the bit set is
# engine-independent too.


def bloom_bits(
    dim: DataFrame, key_col: str, m: int = 4096, k: int = 3
) -> DataFrame:
    """Set bits of the dim key set: (j, pos) distinct rows, j < k,
    pos < m — at most k*m rows regardless of dim size, built with one
    map-side-combined distinct."""
    assert 1 <= k <= len(A)
    h = _h64(F.col(key_col))
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("long").alias("j"),
                    _cell(h, j, m).alias("pos"),
                )
                for j in range(k)
            ]
        )
    ).alias("c")
    return dim.select(cells).select("c.j", "c.pos").distinct()


def bloom_prefilter(
    fact: DataFrame,
    bits: DataFrame,
    key_col: str,
    m: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Keep fact rows whose key sets ALL k Bloom bits: k chained
    broadcast LEFT SEMI joins against the tiny bit relation — each is
    a BroadcastHashJoin probe, the fact never shuffles, and rows are
    never duplicated (semi join, not inner)."""
    assert 1 <= k <= len(A)
    out = fact
    for j in range(k):
        h = _h64(F.col(key_col))
        # reserved name: an unqualified "pos" would be ambiguous (or
        # silently wrong) when the fact itself has a pos column
        pos_j = bits.where(F.col("j") == j).select(
            F.col("pos").alias("__bloom_pos")
        )
        out = out.join(
            F.broadcast(pos_j),
            _cell(h, j, m) == pos_j["__bloom_pos"],
            "left_semi",
        )
    return out


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 4096,
    k: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Exact join with a Bloom prefilter on the fact side. Result is
    identical to fact.join(dim, ...) — the prefilter has no false
    negatives and the join removes false positives — but at scale the
    shuffled fact bytes drop by the dim key set's selectivity.

    Only fact-preserving-on-match joins are legal: a fact-outer join
    would need the rows the prefilter exists to drop."""
    # inner/semi emit matches only; right-outer preserves the DIM side
    # — dropped fact rows could never appear in any of them
    if how not in ("inner", "right", "rightouter", "right_outer",
                   "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_prefilter_join: how={how!r} would need the fact rows "
            "the prefilter drops; use a plain join for fact-outer/anti "
            "semantics"
        )
    # lazy localCheckpoint: the <= k*m-row bit relation materializes
    # once at the first probe's broadcast and the remaining k-1 probes
    # reuse it — the dim is scanned ONCE regardless of k (without it,
    # each probe's broadcast re-derives the bits from a fresh scan)
    bits = bloom_bits(dim, dim_key, m, k).localCheckpoint(eager=False)
    pre = bloom_prefilter(fact, bits, fact_key, m, k)
    return pre.join(dim, pre[fact_key] == dim[dim_key], how)
