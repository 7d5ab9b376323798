"""Deterministic corpus-mixing samplers.

A 100 TB training-data pipeline fixes its source mixture by POLICY
(e.g. 50% en, 25% de, ...) and must draw it reproducibly: the same
document set on every run, retry, engine, and partitioning. These
samplers hash a stable id into [0, 65536) (first 4 hex chars of md5 —
the same portable-hash convention as the dedup family) and keep a row
iff its hash falls under the group's rate — a narrow, shuffle-free
map whose predicate fuses into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "mixture_sample",
    "token_budget_sample",
    "domain_mixture_plan",
    "apply_mixture_plan",
    "dsir_log_ratios",
    "dsir_importance",
    "dsir_sample",
    "ngram_lm_fit",
    "ngram_lm_score",
    "score_terciles",
]


def _hash16(id_col: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("int")


def mixture_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group deterministic Bernoulli sample: keep a row iff
    ``hash16(id) < floor(rate[group] * 65536)``. Groups absent from
    ``rates`` use ``default_rate``. Rates are exact multiples of
    1/65536 after flooring, so the draw replays identically in any
    engine (the oracle replicates it verbatim). Zero shuffle; at
    scale the CASE predicate pushes into the scan stage."""
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {g!r} out of [0,1]: {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate out of [0,1]: {default_rate}")
    cut = F.lit(int(default_rate * 65536))
    for g, r in rates.items():
        cut = F.when(F.col(group_col) == g, int(r * 65536)).otherwise(cut)
    return df.where(_hash16(id_col) < cut)


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    token_col: str,
    budgets: dict[str, int],
    n_buckets: int = 256,
) -> DataFrame:
    """Budgeted mixture: per group, draw documents in the stable hash
    order until the group's TOKEN budget is reached (training mixes
    are specified in tokens, not document counts). A document that
    crosses the boundary is included — every group reaches at least
    its budget when it has the tokens. Groups without a budget are
    dropped. The hash order makes the draw reproducible and
    engine-replayable.

    Scale design (100 TB): training mixes have ~5-20 groups, so a
    cumulative sum over ``Window.partitionBy(group)`` would sort an
    ENTIRE group in one task — terabytes per task. Instead the
    per-group prefix sum is computed hierarchically, the same
    decomposition as :func:`flink_efo_spark.operators.packing.
    pack_shards`:

    1. bucket = leading hex byte(s) of the md5 order key, so buckets
       split each group's hash order into contiguous ranges;
    2. within-(group, bucket) cumulative sums — a window whose
       partition count is ``n_groups * n_buckets`` tasks, each over
       ~1/n_buckets of a group;
    3. per-(group, bucket) totals → bucket offsets via a window
       partitioned BY GROUP over ≤ ``n_buckets`` tiny rows per group;
    4. broadcast-join offsets back; group-cumsum = offset + local.

    The order key (md5, id) is unchanged, so the admitted set is
    IDENTICAL to the naive single-window formulation — only the
    prefix-sum computation splits.
    """
    if not budgets:
        raise ValueError("budgets must name at least one group")
    for g, b in budgets.items():
        if int(b) < 0:
            raise ValueError(f"budget for {g!r} must be >= 0: {b}")
    hex_chars = {16: 1, 256: 2, 4096: 3, 65536: 4}.get(n_buckets)
    if hex_chars is None:
        raise ValueError("n_buckets must be one of 16, 256, 4096, 65536")

    budget = F.lit(None).cast("long")
    for g, b in budgets.items():
        budget = F.when(F.col(group_col) == g, int(b)).otherwise(budget)

    # NULL ids get the empty order key: they sort FIRST (deterministic)
    # and share bucket '' — a NULL md5 would otherwise fall out of the
    # equi-join on (group, bucket) and be silently dropped
    keyed = (
        df.withColumn("__budget", budget)
        .where(F.col("__budget").isNotNull())
        .withColumn(
            "__okey",
            F.coalesce(F.md5(F.col(id_col).cast("string")), F.lit("")),
        )
        .withColumn("__bucket", F.substring("__okey", 1, hex_chars))
    )

    w_in = (
        Window.partitionBy(group_col, "__bucket")
        .orderBy("__okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = keyed.withColumn(
        "__cum_in", F.sum(F.col(token_col).cast("long")).over(w_in)
    )

    totals = keyed.groupBy(group_col, "__bucket").agg(
        F.sum(F.col(token_col).cast("long")).alias("__tot")
    )
    # per-group window over <= n_buckets tiny total rows — bounded by
    # construction, never the data itself
    w_b = (
        Window.partitionBy(group_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        group_col,
        "__bucket",
        F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__offset"),
    )

    return (
        local.join(F.broadcast(offsets), [group_col, "__bucket"])
        .withColumn("__cum", F.col("__offset") + F.col("__cum_in"))
        .where(F.col("__cum") - F.col(token_col) < F.col("__budget"))
        .select(*df.columns)
    )


def domain_mixture_plan(
    df: DataFrame,
    group_col: str,
    text_col: str,
    targets: dict[str, float],
    counter: str = "whitespace",
) -> DataFrame:
    """Training-mixture planning: given TARGET domain weights, derive
    the per-domain deterministic sampling rates that rebalance the
    corpus toward them (the DoReMi/Pile-style "domain reweighting"
    step, computed from data instead of guessed).

    Returns one tiny row per group present in ``df``:

    * n_docs, n_tokens ..... exact counts (``counter`` as in
      pack_shards: "whitespace" | "bpe_estimate")
    * natural_ppm .......... the group's organic token share, in
      exact integer parts-per-million (floor division)
    * target_ppm ........... the requested share (weights quantized
      to ppm on the driver; groups not named get 0)
    * rate_64k ............. keep-probability quantized to /65536 —
      ``min(65536, floor(target_share * total_tokens / n_tokens *
      65536))`` — directly consumable by hash16-based samplers
      (:func:`mixture_sample`, :func:`apply_mixture_plan`)
    * projected_tokens ..... ``n_tokens * rate_64k // 65536``

    All arithmetic is integer: the only divisions are floor divisions
    in DECIMAL(38,0) (products up to target_ppm * 65536 * total_tokens
    ~ 1e24 at 100 TB — far inside 38 digits), so the plan is
    engine-exact with a HUGEINT DuckDB replay. Down-sampling only: a
    group whose natural share is below target saturates at rate 1
    (rate_64k = 65536); callers wanting up-sampling repeat epochs.

    Scale shape: one partial-aggregating groupBy(group) — map-side
    combine collapses the corpus to one row per domain per task —
    then a single-partition window over the ≤ thousands of group
    rows (bounded by construction, never the data)."""
    if not targets:
        raise ValueError("targets must name at least one group")
    ppm: dict[str, int] = {}
    for g, w in targets.items():
        if not (0.0 <= w <= 1.0):
            raise ValueError(f"target weight for {g!r} out of [0,1]: {w}")
        ppm[g] = int(round(w * 1_000_000))
    if sum(ppm.values()) > 1_000_000:
        raise ValueError(
            f"target weights sum to {sum(ppm.values())} ppm > 1"
        )
    if counter == "whitespace":
        from flink_efo_spark.operators.text import _tokens

        n_tok = F.expr(f"size({_tokens(text_col)})")
    elif counter == "bpe_estimate":
        from flink_efo_spark.operators.text import _bpe_estimate_expr

        n_tok = F.coalesce(_bpe_estimate_expr(text_col), F.lit(0))
    else:
        raise ValueError(
            f"counter must be whitespace | bpe_estimate, got {counter!r}"
        )

    target = F.lit(0)
    for g, p in ppm.items():
        target = F.when(F.col(group_col) == g, p).otherwise(target)

    counts = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.greatest(n_tok.cast("long"), F.lit(0))).alias("n_tokens"),
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = "decimal(38,0)"
    planned = (
        counts.withColumn("total_tokens", F.sum("n_tokens").over(w_all))
        .withColumn("__tppm", target.cast("long"))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            F.expr(
                f"cast(cast(1000000 as {dec}) * n_tokens as {dec})"
                f" div cast(greatest(total_tokens, 1) as {dec})"
            ).cast("long").alias("natural_ppm"),
            F.col("__tppm").alias("target_ppm"),
            F.when(F.col("n_tokens") <= 0, F.lit(0))
            .otherwise(
                F.least(
                    F.lit(65536),
                    F.expr(
                        f"cast(cast(65536 as {dec}) * __tppm"
                        f" * total_tokens as {dec})"
                        f" div cast(cast(1000000 as {dec})"
                        f" * n_tokens as {dec})"
                    ).cast("long"),
                )
            )
            .alias("rate_64k"),
        )
    )
    return planned.withColumn(
        "projected_tokens",
        F.expr(
            f"cast(cast(n_tokens as {dec}) * rate_64k as {dec})"
            f" div cast(65536 as {dec})"
        ).cast("long"),
    )


def apply_mixture_plan(
    df: DataFrame, id_col: str, group_col: str, plan: DataFrame
) -> DataFrame:
    """Apply a :func:`domain_mixture_plan`: keep a row iff
    ``hash16(id) < rate_64k`` of its group. Same deterministic draw
    as :func:`mixture_sample`, with the rates coming from a plan
    DataFrame instead of a literal dict. Groups missing from the
    plan are dropped (inner join). The plan is one row per domain —
    broadcast, zero shuffle on the corpus side."""
    rates = plan.select(group_col, "rate_64k")
    return (
        df.join(F.broadcast(rates), group_col)
        .where(_hash16(id_col) < F.col("rate_64k"))
        .select(*df.columns)
    )


def _ngrams_expr(text_col: str) -> Column:
    """Unigrams + bigrams of ``lower(trim(text))`` split on ' ' — the
    DSIR featurizer (hashed n-gram bag). The token array is bound via
    ``transform(array(...), __t -> ...)`` so CollapseProject cannot
    inline the split() per reference (the 16x pitfall documented at
    dedup._shingles_expr)."""
    body = (
        "concat(__t, case when size(__t) >= 2 then "
        "zip_with(slice(__t, 1, size(__t) - 1), slice(__t, 2, size(__t) - 1), "
        "(a, b) -> concat(a, ' ', b)) "
        "else cast(array() as array<string>) end)"
    )
    return F.expr(
        f"element_at(transform(array(split(trim(lower({text_col})), ' ')), "
        f"__t -> {body}), 1)"
    )


def _bucket_expr(gram_col: str, num_buckets: int) -> Column:
    """Portable n-gram -> bucket: md5-hash64 (the dedup-family
    convention, engine-replayable) mod num_buckets."""
    return F.expr(
        f"cast(conv(substr(md5({gram_col}), 1, 15), 16, 10) as bigint)"
        f" % {num_buckets}"
    ).cast("int")


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame | Column,
    text_col: str,
    num_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance-ratio table (Xie et al. 2023, arXiv:2302.03169,
    "Data Selection for Language Models via Importance Resampling"):
    fit hashed-n-gram multinomials over the TARGET corpus (the
    distribution you want more of) and the RAW corpus (what you have),
    and emit the per-bucket log ratio ``ln p_target(b) - ln p_raw(b)``
    with Laplace smoothing ``alpha``.

    Returns one row per bucket 0..num_buckets-1 (a complete spine, so
    scoring is a plain inner join): (bucket int, micro_log_ratio
    bigint). Ratios are quantized to MICRO-NATS (x 1e6, rounded to
    integer) so document weights are EXACT INTEGER sums — immune to
    the float-addition-order nondeterminism an order-dependent double
    sum would have across engines and partitionings.

    Scale shape: two n-gram count aggregations (map-side partial
    combine into <= num_buckets groups), two 1-row totals broadcast
    back, one spine of num_buckets literal rows. The output is
    KB-sized metadata — broadcast it at scoring time.

    ``target`` may also be a boolean Column PREDICATE over ``raw``
    (the common "target is a labelled slice of the corpus" case, e.g.
    ``F.col("lang") == "en"``): the raw and target multinomials are
    then fitted in ONE corpus pass with conditional aggregation
    (count(*) vs count(CASE WHEN pred)) instead of two scans — the
    counts are identical to the two-scan fit over
    ``raw.where(pred)`` because count(CASE WHEN pred THEN 1 END)
    skips exactly the rows where() drops (false or NULL).
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1: {num_buckets}")
    if alpha <= 0.0:
        raise ValueError(f"alpha must be > 0 (Laplace smoothing): {alpha}")
    spark = raw.sparkSession

    from flink_efo_spark.catalog import ensure_min_parallelism

    if isinstance(target, Column):
        # fused single-pass fit: one explode, both counts. Project to
        # (pred, text) BEFORE the parallelism floor so the widening
        # shuffle moves only the columns the pass reads (guide-§2.3
        # discipline); the floor itself is a no-op at scale (a 100 TB
        # scan already has >= default-parallelism splits) but keeps a
        # single-row-group local file from running the md5 pass on
        # one core.
        grams = ensure_min_parallelism(
            raw.select(target.alias("__is_t"), F.col(text_col))
        ).select(
            "__is_t",
            F.explode(_ngrams_expr(text_col)).alias("__g"),
        )
        both = (
            grams.select(
                "__is_t", _bucket_expr("__g", num_buckets).alias("bucket")
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("__cr"),
                F.count(F.when(F.col("__is_t"), F.lit(1))).alias("__ct"),
            )
        )
        rc, tc = both, None
    else:

        def counts(df: DataFrame, name: str) -> DataFrame:
            grams = ensure_min_parallelism(df.select(F.col(text_col))).select(
                F.explode(_ngrams_expr(text_col)).alias("__g")
            )
            return (
                grams.select(_bucket_expr("__g", num_buckets).alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias(name))
            )

        rc = counts(raw, "__cr")
        tc = counts(target, "__ct")
    spine = spark.range(num_buckets).select(F.col("id").cast("int").alias("bucket"))
    # localCheckpoint is load-bearing: `joined` feeds BOTH the totals
    # and the final select, and without it Spark re-executes the whole
    # n-gram counting lineage (the corpus scans — the dominant cost at
    # 100 TB) once per consumer. The checkpoint pins num_buckets rows.
    joined = spine.join(rc, "bucket", "left")
    if tc is not None:
        joined = joined.join(tc, "bucket", "left")
    joined = (
        joined.select(
            "bucket",
            F.coalesce("__cr", F.lit(0)).alias("__cr"),
            F.coalesce("__ct", F.lit(0)).alias("__ct"),
        )
        .localCheckpoint(eager=True)
    )
    totals = joined.agg(
        F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt")
    )
    b_alpha = float(alpha) * num_buckets
    ratio = F.log(
        (F.col("__ct") + F.lit(float(alpha))) / (F.col("__tt") + F.lit(b_alpha))
    ) - F.log(
        (F.col("__cr") + F.lit(float(alpha))) / (F.col("__tr") + F.lit(b_alpha))
    )
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(ratio * 1_000_000, 0).cast("long").alias("micro_log_ratio"),
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    log_ratios: DataFrame,
    num_buckets: int = 4096,
) -> DataFrame:
    """Score every document with its DSIR importance weight: the sum
    over the document's hashed n-grams of the bucket's micro-nat log
    ratio (``log_ratios`` from :func:`dsir_log_ratios`). The contract
    that ``num_buckets`` matches the fit is VALIDATED, not assumed:
    the ratio table is a complete spine of exactly num_buckets rows,
    so one KB-sized count() catches a mismatch that would otherwise
    silently drop grams hashing past the table's spine. NULL-text
    documents are excluded from the output (they have no n-grams to
    score — and the DuckDB oracles, which build weights from the
    gram CTE, agree on that set by construction); any non-NULL text
    yields at least one gram, so every other document is scored.

    Returns (id, weight_micro bigint, weight double = micro / 1e6).
    weight_micro is the EXACT integer — order by it, not the double.

    Scale shape: explode -> broadcast-join the KB ratio table ->
    per-document integer sum with map-side partial aggregation. No
    window, no driver action.
    """
    n_ratio_rows = log_ratios.count()
    if n_ratio_rows != num_buckets:
        raise ValueError(
            f"num_buckets={num_buckets} does not match the fitted ratio "
            f"table ({n_ratio_rows} spine rows) — pass the num_buckets "
            f"used in dsir_log_ratios"
        )
    from flink_efo_spark.catalog import ensure_min_parallelism

    docs = df.where(F.col(text_col).isNotNull())
    # (id, text) projection + parallelism floor before the md5 gram
    # pass — same reasoning as the fit (no-op at scale, unsticks the
    # single-row-group local scan)
    grams = ensure_min_parallelism(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col), F.explode(_ngrams_expr(text_col)).alias("__g")
    ).select(F.col(id_col), _bucket_expr("__g", num_buckets).alias("bucket"))
    sums = (
        grams.join(F.broadcast(log_ratios), "bucket")
        .groupBy(id_col)
        .agg(F.sum("micro_log_ratio").alias("weight_micro"))
    )
    return (
        docs.select(id_col)
        .join(sums, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("weight_micro", F.lit(0)).cast("long").alias("weight_micro"),
            (F.coalesce("weight_micro", F.lit(0)) / 1_000_000.0).alias("weight"),
        )
    )


def dsir_sample(
    raw: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame | Column,
    n: int,
    num_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """End-to-end DSIR selection: fit ratios on (raw, target), score
    raw, keep the n documents with the highest importance weight
    (ties to the lower id) — the deterministic top-n variant of the
    paper's Gumbel-noised resampling, chosen because a training
    pipeline wants the SAME n documents on every engine and retry
    (the corpus's reproducibility discipline; add hash-seeded Gumbel
    noise upstream if sampling WITHOUT replacement of the softmax is
    required). Returns (id, weight_micro, weight).

    The top-n is orderBy+limit — Spark's TakeOrderedAndProject, a
    per-partition heap then a driver merge of n rows, no global sort.

    ``target`` as a boolean Column predicate over ``raw`` selects the
    fused single-pass fit (see :func:`dsir_log_ratios`).
    """
    ratios = dsir_log_ratios(raw, target, text_col, num_buckets, alpha)
    scored = dsir_importance(raw, id_col, text_col, ratios, num_buckets)
    return scored.orderBy(
        F.col("weight_micro").desc(), F.col(id_col).asc()
    ).limit(n)


def _bigrams_expr(text_col: str) -> Column:
    """(context, next) word-bigram pairs of ``lower(trim(text))``
    split on ' ' as array<struct<a:string, b:string>> (empty for
    docs with < 2 tokens). Same transform-binding shape as
    :func:`_ngrams_expr` (the CollapseProject 16x pitfall)."""
    body = (
        "case when size(__t) >= 2 then "
        "zip_with(slice(__t, 1, size(__t) - 1), slice(__t, 2, size(__t) - 1), "
        "(a, b) -> named_struct('a', a, 'b', b)) "
        "else cast(array() as array<struct<a:string, b:string>>) end"
    )
    return F.expr(
        f"element_at(transform(array(split(trim(lower({text_col})), ' ')), "
        f"__t -> {body}), 1)"
    )


def ngram_lm_fit(
    target: DataFrame,
    text_col: str,
    num_buckets: int = 256,
    alpha: float = 1.0,
) -> DataFrame:
    """Hashed BIGRAM language model over the TARGET corpus — the
    Spark-shaped stand-in for CCNet's KenLM perplexity filter (Wenzek
    et al. 2020, arXiv:1911.00359: score every document by its LM
    cross-entropy under a clean-corpus model, filter/bucket on it).
    Token buckets are md5-hash64 mod ``num_buckets`` (the portable
    hash), and the model is the Laplace-smoothed conditional
    ``p(b2 | b1) = (c(b1,b2) + alpha) / (c(b1) + alpha*num_buckets)``
    emitted as MICRO-NAT integers over the COMPLETE num_buckets^2
    spine — so scoring is a plain inner join and unseen bigrams get
    the smoothed floor, exactly as in both engines.

    Returns (b1 int, b2 int, micro_logp bigint): num_buckets^2 rows —
    keep num_buckets modest (256 -> 65,536 rows, a broadcastable
    model; the hashing IS the model compression).

    Scale shape: one bigram-count aggregation with map-side partial
    combine into <= num_buckets^2 groups, a context-marginal
    re-aggregation of THOSE counts (never a second corpus scan), and
    the spine join — all metadata-sized after the single scan.
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1: {num_buckets}")
    if alpha <= 0.0:
        raise ValueError(f"alpha must be > 0 (Laplace smoothing): {alpha}")
    spark = target.sparkSession
    pairs = target.select(
        F.explode(_bigrams_expr(text_col)).alias("__p")
    ).select(
        _bucket_expr("__p.a", num_buckets).alias("b1"),
        _bucket_expr("__p.b", num_buckets).alias("b2"),
    )
    # localCheckpoint is load-bearing (the dsir_log_ratios lesson):
    # `counts` feeds BOTH the context marginal and the spine join, and
    # without it the corpus-scan counting lineage executes twice
    # (verified: 2 parquet scans, no exchange reuse). The checkpoint
    # pins <= num_buckets^2 metadata-sized rows.
    counts = (
        pairs.groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=True)
    )
    ctx = counts.groupBy("b1").agg(F.sum("__c").alias("__cc"))
    # one range, no cross join: id = b1 * num_buckets + b2 (a 256^2
    # crossJoin would plan as a BroadcastNestedLoopJoin — avoidable)
    spine = spark.range(num_buckets * num_buckets).select(
        F.floor(F.col("id") / num_buckets).cast("int").alias("b1"),
        (F.col("id") % num_buckets).cast("int").alias("b2"),
    )
    b_alpha = float(alpha) * num_buckets
    logp = F.log(
        (F.coalesce("__c", F.lit(0)) + F.lit(float(alpha)))
        / (F.coalesce("__cc", F.lit(0)) + F.lit(b_alpha))
    )
    return (
        spine.join(counts, ["b1", "b2"], "left")
        .join(ctx, "b1", "left")
        .select(
            "b1",
            "b2",
            F.round(logp * 1_000_000, 0).cast("long").alias("micro_logp"),
        )
    )


def ngram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: DataFrame,
    num_buckets: int = 256,
) -> DataFrame:
    """Per-document cross-entropy under a :func:`ngram_lm_fit` model
    (the CCNet filter signal: LOW cross-entropy = target-like text,
    HIGH = junk): sum the micro-nat log-probs of the document's
    hashed bigrams — an EXACT integer — and emit the per-bigram mean
    as ``cross_entropy`` (nats, rounded to 6 decimals; NULL for docs
    with < 2 tokens). NULL-text documents are excluded (the
    dsir_importance convention — the gram-CTE-based oracles agree on
    that set by construction). The num_buckets contract is validated
    against the model's complete-spine row count (KB-sized check).

    Returns (id, n_bigrams bigint, sum_micro_logp bigint,
    cross_entropy double).

    Scale shape: explode -> broadcast-join the model -> per-document
    integer sum with map-side partial aggregation; one narrow
    division at the end. No window, no driver action.
    """
    n_lm_rows = lm.count()
    if n_lm_rows != num_buckets * num_buckets:
        raise ValueError(
            f"num_buckets={num_buckets} does not match the fitted model "
            f"({n_lm_rows} spine rows) — pass the num_buckets used in "
            f"ngram_lm_fit"
        )
    docs = df.where(F.col(text_col).isNotNull())
    grams = docs.select(
        F.col(id_col), F.explode(_bigrams_expr(text_col)).alias("__p")
    ).select(
        F.col(id_col),
        _bucket_expr("__p.a", num_buckets).alias("b1"),
        _bucket_expr("__p.b", num_buckets).alias("b2"),
    )
    sums = (
        grams.join(F.broadcast(lm), ["b1", "b2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("micro_logp").alias("sum_micro_logp"),
        )
    )
    return (
        docs.select(id_col)
        .join(sums, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_micro_logp", F.lit(0))
            .cast("long")
            .alias("sum_micro_logp"),
            F.round(
                F.try_divide(
                    -F.coalesce("sum_micro_logp", F.lit(0)) / 1_000_000.0,
                    F.coalesce("n_bigrams", F.lit(0)),
                ),
                6,
            ).alias("cross_entropy"),
        )
    )


def score_terciles(
    scores: DataFrame,
    id_col: str,
    score_col: str,
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style value-tercile bucketing (Wenzek et al. 2020,
    arXiv:1911.00359 §4.3: split the corpus into head/middle/tail by
    LM perplexity and train on the head): the 1/3 and 2/3 EXACT
    percentile cuts of ``score_col`` (NULLs excluded), then every row
    labeled by ``score <= cut`` comparisons — low scores get
    ``labels[0]``. NULL scores (e.g. a doc with no bigrams) fall to
    ``labels[2]``, documented worst-bucket behavior.

    Returns the input columns + ``bucket``. Cut values are rounded to
    6 decimals IN BOTH ENGINES before comparison (the token_quantiles
    precedent: Spark ``percentile`` and DuckDB ``quantile_cont`` use
    the same continuous interpolation; rounding buries last-ulp
    expression-order noise, and a row can only sit exactly ON a cut
    when the cut is one of the 6dp score values itself, where both
    engines agree bitwise).

    Scale shape: one exact-percentile aggregate to a single 2-number
    row (exact percentile shuffles the score column to one reducer —
    at 100 TB swap in percentile_approx's t-digest, map-side
    mergeable, same plan shape), broadcast back as a 1-row build
    (the DSIR-totals allowlist pattern), then a narrow CASE."""
    p1, p2 = 1 / 3, 2 / 3
    cuts = scores.agg(
        F.round(F.percentile(score_col, F.lit(p1)), 6).alias("__c1"),
        F.round(F.percentile(score_col, F.lit(p2)), 6).alias("__c2"),
    )
    s = F.col(score_col)
    return (
        scores.crossJoin(F.broadcast(cuts))
        .withColumn(
            "bucket",
            F.when(s.isNull(), F.lit(labels[2]))
            .when(s <= F.col("__c1"), F.lit(labels[0]))
            .when(s <= F.col("__c2"), F.lit(labels[1]))
            .otherwise(F.lit(labels[2])),
        )
        .drop("__c1", "__c2")
    )
