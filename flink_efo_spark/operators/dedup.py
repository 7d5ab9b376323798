"""Deduplication operators.

Two families:

1. **Row dedup** (reference semantics: StreamExecDeduplicate.scala:52,
   DeduplicateKeepFirstRowFunction / DeduplicateKeepLastRowFunction in
   /root/reference, the `ROW_NUMBER()=1` pattern) — keep first/last
   row per key.

2. **Near-duplicate detection for training-data pipelines** (beyond
   the reference's surface, required for the 100 TB corpus use case):
   exact-hash, MinHash+LSH, SimHash, and exhaustive n-gram Jaccard.

Cross-engine determinism: every hash used here is derived from
``md5`` (identical in Spark / DuckDB / anything), mapped to int via
hex→decimal, then mixed with pure integer arithmetic. This makes the
operators oracle-checkable bit-for-bit — no engine-specific hash
(xxhash64, murmur) in the contract.

Scale notes (100 TB):
* MinHash/LSH is the linear-cost path: per doc O(shingles × perms)
  map-side work, one shuffle on band buckets, and pairwise work only
  *within* buckets. The exact-Jaccard verify join touches candidate
  pairs only.
* Exhaustive ``ngram_jaccard_pairs`` is quadratic per block — callers
  must provide a blocking key; it exists as the oracle/verify path.
* All expressions are built-in Catalyst functions (no Python UDFs):
  whole-stage codegen applies end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_efo_spark.catalog import ensure_min_parallelism

# 2^31-1 (prime): minhash universe. Kept < 2^31 so a*h+b stays in i64.
MERSENNE31 = 2147483647


def dedup_keep_first(
    df: DataFrame, key: list[str], order_by: list[Column]
) -> DataFrame:
    """Keep the first row per key in the given order (deterministic —
    pass a unique tiebreak). Reference: DeduplicateKeepFirstRowFunction."""
    w = Window.partitionBy(*key).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_last(df: DataFrame, key: list[str], order_by: list[Column]) -> DataFrame:
    """Keep the last row per key (reference: DeduplicateKeepLastRowFunction)."""
    return dedup_keep_first(df, key, [c.desc() for c in order_by])


def dedup_exact(
    df: DataFrame,
    id_col: str,
    text_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Exact-content dedup: group by content fingerprint, keep the row
    with the smallest id. Returns the surviving rows plus the
    fingerprint and the duplicate-group size.

    The fingerprint is md5 of (optionally normalized) text — a
    shuffle on a 32-char key instead of the full document, which is
    what makes this viable at 100 TB.

    Physical shape: ``min_by(struct(all cols), id)`` aggregation, NOT
    ``row_number() OVER (PARTITION BY fingerprint)``. The window form
    shuffles EVERY row to its fingerprint partition and sorts there;
    the aggregate form does a map-side partial combine (Spark plans a
    partial SortAggregate — struct buffers aren't hash-aggregable —
    so each input partition is sorted locally, but only one candidate
    survivor per fingerprint per partition reaches the shuffle). At
    100 TB that is the difference between shuffling the corpus and
    shuffling ~one row per distinct document.
    """
    content = F.col(text_col)
    if normalize:
        content = F.regexp_replace(F.lower(F.trim(content)), r"\s+", " ")
    cols = df.columns
    # parallelism floor (no-op on wide scans): the normalize+md5 map
    # and the partial sort-aggregate otherwise run on however few
    # splits the file has
    return (
        ensure_min_parallelism(df)
        .withColumn("fingerprint", F.md5(content))
        .groupBy("fingerprint")
        .agg(
            F.min_by(F.struct(*cols), F.col(id_col)).alias("__row"),
            F.count("*").alias("group_size"),
        )
        .select(
            *[F.col(f"__row.{c}").alias(c) for c in cols],
            "fingerprint",
            "group_size",
        )
    )


# ---------------------------------------------------------------------------
# shingling + deterministic hashing building blocks
# ---------------------------------------------------------------------------


def _shingles_expr(text_col: str, k: int) -> Column:
    """Distinct word k-gram shingles of lower(text), 1-indexed
    element_at so the same expression translates to DuckDB lists.

    Two non-obvious shapes in here:

    * Guard docs shorter than k tokens: sequence(1, 0) is DESCENDING
      ([1, 0]) in Spark, so an unguarded form indexes past the array
      and throws under ANSI mode. Short docs yield an empty shingle
      set (then dropped by shingle_sets' size>0 filter).
    * The token array is bound via ``transform(array(split(...)),
      __t -> ...)[1]`` instead of a projected column: CollapseProject
      inlines column aliases into every lambda reference, so the
      naive form re-evaluates split() per element_at per position —
      measured 16× slower at sf0.1.
    """
    parts = ", ".join(f"element_at(__t, i + {j})" for j in range(k))
    body = (
        f"case when size(__t) >= {k} then "
        f"array_distinct(transform(sequence(1, size(__t) - {k - 1}),"
        f" i -> concat_ws(' ', {parts}))) "
        f"else cast(array() as array<string>) end"
    )
    return F.expr(
        f"element_at(transform(array(split(trim(lower({text_col})), ' ')), "
        f"__t -> {body}), 1)"
    ).alias("shingles")


def _hash64_expr(inner: str) -> str:
    """Portable string→int hash: first 15 hex chars of md5 → bigint.
    (< 2^60, positive.)"""
    return f"cast(conv(substr(md5({inner}), 1, 15), 16, 10) as bigint)"


def shingle_sets(
    df: DataFrame, id_col: str, text_col: str, shingle_size: int = 3
) -> DataFrame:
    """(id, shingles array<string>) with empty-shingle docs removed."""
    return df.select(
        F.col(id_col), _shingles_expr(text_col, shingle_size)
    ).where(F.size("shingles") > 0)


def minhash_signatures(
    shingled: DataFrame, num_perm: int = 12
) -> DataFrame:
    """Add ``mh`` — array of num_perm minhash values.

    mh_j = min over shingles of ((a_j * (h64 % M) + b_j) mod M),
    a_j = 2j+1, b_j = 104729*j + 12345, M = 2^31-1. Integer-only —
    identical in any engine.

    The md5-derived base hash is computed ONCE per shingle into an
    intermediate array; the num_perm affine permutations then run over
    the integer array (md5 is ~20× the cost of the affine step, so
    hashing per-perm would multiply the map cost by num_perm).
    """
    h = _hash64_expr("s")
    perms = ", ".join(
        f"array_min(transform(__hs, h -> "
        f"(({2 * j + 1} * h + {104729 * j + 12345}) % {MERSENNE31})))"
        for j in range(num_perm)
    )
    return (
        shingled.withColumn(
            "__hs", F.expr(f"transform(shingles, s -> {h} % {MERSENNE31})")
        )
        .withColumn("mh", F.expr(f"array({perms})"))
        .drop("__hs")
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 12,
    bands: int = 4,
    shingle_size: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, exact-Jaccard verified.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold. LSH (bands × rows) prunes the candidate set;
    the verify step recomputes exact shingle-set Jaccard so LSH only
    affects recall, never precision.

    ``max_bucket_size``: hot-bucket straggler guard for 100 TB corpora
    — a bucket holding B near-identical docs (boilerplate) yields
    B²/2 candidate pairs inside one task. Capping drops buckets larger
    than the limit from candidate generation (an explicit recall
    tradeoff: members of dropped buckets usually co-occur in other,
    smaller buckets; default None = exact LSH recall, right for
    oracle-checked runs).
    """
    if bands < 1 or num_perm % bands != 0:
        raise ValueError(
            f"bands must divide num_perm "
            f"({num_perm} % {bands} != 0) — a remainder silently "
            "drops signature rows from the banding, and "
            "rows_per_band = 0 degenerates every band to one bucket"
        )
    rows_per_band = num_perm // bands
    # persist + eager count: the hashed-shingle pipeline feeds the
    # bucket self-join (2 consumers) AND the verify join (2 more);
    # without persist Spark recomputes the md5+shingle map 4-5× (AQE
    # defeats ReusedExchange across the self-join), and without the
    # eager barrier the self-join's two concurrent stages race the
    # cache and duplicate the map work anyway (measured 12s → 7.6s at
    # sf0.1).
    #
    # What gets cached is (id, int64 shingle-hash array) — NOT the
    # string shingles and never the documents: 8 bytes/shingle to
    # serialize instead of ~20-char strings (cache write was the
    # hidden cost of the string form, ~2.5s at sf0.1), and the exact-
    # Jaccard verify then runs integer set-ops instead of string
    # compares. Jaccard over the 60-bit hashes equals Jaccard over
    # the shingle sets unless md5-60bit collides inside one compared
    # pair (P ~ n²/2^61 — at 1e9 distinct shingles per partition-pair
    # still < 1e-3); the minhash signatures themselves are hash-based
    # anyway, so this adds no new approximation class.
    narrow = ensure_min_parallelism(df.select(id_col, text_col))
    shingled = shingle_sets(narrow, id_col, text_col, shingle_size)
    h = _hash64_expr("s")
    hashed = shingled.select(
        F.col(id_col), F.expr(f"transform(shingles, s -> {h})").alias("__h64")
    ).persist()
    hashed.count()  # eager barrier — see note above
    # identical values to minhash_signatures(): hs = h64 % M, then the
    # affine permutations
    perms = ", ".join(
        f"array_min(transform(__hs, h -> "
        f"(({2 * j + 1} * h + {104729 * j + 12345}) % {MERSENNE31})))"
        for j in range(num_perm)
    )
    sigs = (
        hashed.withColumn(
            "__hs", F.expr(f"transform(__h64, h -> h % {MERSENNE31})")
        )
        .withColumn("mh", F.expr(f"array({perms})"))
        .drop("__hs")
    )

    band_exprs = [
        F.concat_ws(
            ":",
            F.lit(b),
            *[
                F.element_at("mh", b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)
            ],
        ).alias("bucket")
        for b in range(bands)
    ]
    buckets_cached = sigs.select(
        F.col(id_col), F.explode(F.array(*band_exprs)).alias("bucket")
    ).persist()
    buckets_cached.count()  # eager barrier for the self-join below
    buckets = buckets_cached
    if max_bucket_size is not None:
        bw = Window.partitionBy("bucket")
        buckets = (
            buckets.withColumn("__bsz", F.count("*").over(bw))
            .where(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    # candidate pairs: ids sharing any band bucket
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    # verify: exact Jaccard on the hashed shingle sets (candidates
    # only) — integer array set-ops, see the cache note above
    sa = hashed.select(
        F.col(id_col).alias("id_a"), F.col("__h64").alias("sh_a")
    )
    sb = hashed.select(
        F.col(id_col).alias("id_b"), F.col("__h64").alias("sh_b")
    )
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # materialize the (small) verified pair set, then drop the big
    # cached intermediates — without this every call leaks the shingle
    # + bucket caches for the session lifetime. localCheckpoint blocks
    # are executor-resident and auto-cleaned when the returned frame
    # is GC'd (ContextCleaner), unlike catalog-cached plans.
    out = verified.localCheckpoint(eager=True)
    buckets_cached.unpersist()
    hashed.unpersist()
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_by: str,
    threshold: float = 0.8,
    shingle_size: int = 3,
) -> DataFrame:
    """Exhaustive within-block n-gram Jaccard (the verify/oracle path;
    quadratic per block — ``block_by`` bounds the blowup)."""
    shingled = ensure_min_parallelism(
        df.select(id_col, block_by, text_col)
    ).select(
        F.col(id_col), F.col(block_by), _shingles_expr(text_col, shingle_size)
    ).where(F.size("shingles") > 0)
    a = shingled.alias("a")
    b = shingled.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_by}") == F.col(f"b.{block_by}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                F.size(F.array_intersect("a.shingles", "b.shingles"))
                / F.size(F.array_union("a.shingles", "b.shingles"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    chunks: int = 4,
    chunk_bits: int = 16,
) -> DataFrame:
    """SimHash over the portable 60-bit shingle hash, emitted as
    ``chunks`` × ``chunk_bits`` integer chunks (chunked form doubles
    as the LSH banding key: hamming ≤ chunks-1 pairs must share ≥1
    chunk).

    bit_b = sign of sum over shingles of (2*((h >> b) & 1) - 1).

    Effective width is **60 bits**, not chunks*chunk_bits: the
    md5-prefix hash (_hash64_expr, 15 hex chars) is < 2^60, so bits
    60..63 are 0 for every shingle, their majority sums are negative,
    and the top 4 bits of the last chunk are constant 0. Hamming
    distances are therefore true 60-bit distances (the constant bits
    cancel), and the last chunk carries chunk_bits-4 informative bits
    — its bucket collides up to 16× more often than a full-width
    chunk would, which costs candidate-verify work, never recall.
    Deterministic and oracle-replayed as-is; widening the hash would
    break the portable-hash convention every oracle shares."""
    narrow = ensure_min_parallelism(df.select(id_col, text_col))
    shingled = shingle_sets(narrow, id_col, text_col, shingle_size)
    h = _hash64_expr("s")
    # hash each shingle ONCE into an integer array; the 64 per-bit
    # majority sums then fold over integers, not re-run md5 64 times
    hashed = shingled.withColumn("__hs", F.expr(f"transform(shingles, s -> {h})"))
    chunk_cols = []
    for c in range(chunks):
        bit_terms = " + ".join(
            f"(case when aggregate(__hs, 0L, (acc, h) -> acc + "
            f"(2 * ((h >> {c * chunk_bits + i}) & 1) - 1)) > 0 "
            f"then {1 << i} else 0 end)"
            for i in range(chunk_bits)
        )
        chunk_cols.append(F.expr(f"cast({bit_terms} as bigint)").alias(f"sim_c{c}"))
    return hashed.select(F.col(id_col), *chunk_cols)


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    shingle_size: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ max_hamming
    (≤ 3 guaranteed found by 4-chunk banding; the check is exact)."""
    # persisted: 4 chunk self-joins + the hamming verify all reuse it
    # (eager count = barrier so concurrent join stages don't race the
    # cache and duplicate the signature map work)
    sigs = simhash_signatures(df, id_col, text_col, shingle_size).persist()
    sigs.count()
    chunk_names = [c for c in sigs.columns if c.startswith("sim_c")]
    pairs = None
    a, b = sigs.alias("a"), sigs.alias("b")
    for c in chunk_names:
        p = a.join(
            b,
            (F.col(f"a.{c}") == F.col(f"b.{c}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        ).select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        pairs = p if pairs is None else pairs.union(p)
    pairs = pairs.distinct()
    sa = sigs.select(
        F.col(id_col).alias("id_a"), *[F.col(c).alias(f"a_{c}") for c in chunk_names]
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"), *[F.col(c).alias(f"b_{c}") for c in chunk_names]
    )
    hamming = None
    for c in chunk_names:
        term = F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
        hamming = term if hamming is None else hamming + term
    result = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    # materialize the small pair set, release the signature cache
    # (same no-leak contract as minhash_near_duplicates)
    out = result.localCheckpoint(eager=True)
    sigs.unpersist()
    return out


def dedup_incremental(
    new_df: DataFrame,
    seen_sigs: DataFrame,
    id_col: str,
    fingerprint: Column,
    sig_col: str = "fingerprint",
) -> tuple[DataFrame, DataFrame]:
    """Incremental exact dedup: deduplicate a NEW batch of documents
    against an existing corpus using only the corpus's signature
    store — old document bodies are never rescanned, which is the
    whole point at 100 TB (the store is one 32-char key per distinct
    historical document, bucketable by ``sig_col`` so the anti-join
    is co-located with no shuffle of the store).

    ``fingerprint`` is the signature expression (full normalized-text
    md5, a normalized-prefix md5 for boilerplate-tolerant matching, a
    SimHash band, …) — the caller picks the equivalence; this
    operator owns the incremental protocol.

    Returns ``(survivors, new_sigs)``: the batch rows that are first
    of their signature within the batch AND unseen in the store
    (keep-first via the same min_by map-side-combine shape as
    :func:`dedup_exact`), and the signatures to append to the store
    for the next increment.
    """
    cols = new_df.columns
    # NULL fingerprints coalesce to a sentinel: groupBy collapses NULL
    # keys within a batch but a left_anti join never matches NULL
    # against the store, so without this a NULL-sig document would
    # survive (and re-append) EVERY batch — the dedup result would
    # depend on batch boundaries, breaking incremental == sequential
    batch = ensure_min_parallelism(new_df).withColumn(
        sig_col, F.coalesce(fingerprint, F.lit("__null_fingerprint__"))
    )
    survivors = (
        batch.groupBy(sig_col)
        .agg(
            F.min_by(F.struct(*cols), F.col(id_col)).alias("__row"),
            F.count("*").alias("group_size"),
        )
        .select(
            *[F.col(f"__row.{c}").alias(c) for c in cols],
            sig_col,
            "group_size",
        )
    )
    fresh = survivors.join(seen_sigs.select(sig_col), sig_col, "left_anti")
    return fresh, fresh.select(sig_col)


def band_keys(
    sigs: DataFrame,
    id_col: str,
    bands: int,
    num_perm: int,
    sig_col: str = "mh",
) -> DataFrame:
    """Explode minhash signatures into LSH band keys
    ``(id, band_idx, band_hash)``. With one row per band the key IS
    the signature component; wider bands hash the slice (portable
    md5-prefix hash, engine-replayable)."""
    rpb = num_perm // bands
    if bands * rpb != num_perm:
        raise ValueError(f"bands={bands} must divide num_perm={num_perm}")
    if rpb == 1:
        expr = (
            f"transform({sig_col}, (v, i) -> "
            "struct(i AS band_idx, v AS band_hash))"
        )
    else:
        h = _hash64_expr(f"array_join(slice({sig_col}, b * {rpb} + 1, {rpb}), '_')")
        expr = (
            f"transform(sequence(0, {bands - 1}), b -> "
            f"struct(b AS band_idx, {h} AS band_hash))"
        )
    return sigs.select(
        F.col(id_col), F.explode(F.expr(expr)).alias("__bk")
    ).select(id_col, "__bk.band_idx", "__bk.band_hash")


def dedup_incremental_near(
    new_df: DataFrame,
    band_store: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 12,
    bands: int = 3,
    shingle_size: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Incremental NEAR-duplicate dedup: deduplicate a NEW batch
    against the corpus using only an LSH **band-key store** — the
    near-dup completion of :func:`dedup_incremental` (which is exact).
    At 100 TB this is the shape that matters: historical documents are
    never rescanned and never stored; the store holds DISTINCT
    ``(band_idx, band_hash)`` keys — ``bands`` longs per distinct
    near-dup equivalence witness, bucketable on the key pair so the
    probe co-locates with no store shuffle.

    Decision rule (order-deterministic, engine-replayable): a batch
    document is a duplicate iff it shares ANY band key with the store
    or with an earlier-``id_col`` document of the same batch —
    standard banded-MinHash dedup where LSH collision IS the
    equivalence. Band geometry sets the effective threshold
    (P(dup) = 1-(1-j^r)^b for Jaccard j with r rows per band): the
    default 3 bands x 4 rows targets j ~ 0.75; a verify join would
    need document bodies, which an incremental store by design does
    not keep.

    Returns ``(survivors, new_bands)``: batch rows that are no-dup,
    and the batch's distinct band keys to append to the store.
    Documents with no shingles (shorter than the shingle window)
    carry no keys and always survive.
    """
    sh = shingle_sets(
        ensure_min_parallelism(new_df.select(id_col, text_col)),
        id_col, text_col, shingle_size,
    )
    sigs = minhash_signatures(sh, num_perm)
    # eager localCheckpoint, NOT persist: the returned survivors /
    # new_bands frames depend on `keys` lazily, so a persist could
    # never be unpersisted by this function — and per-micro-batch
    # callers (stream_incremental_near_dedup's foreachBatch) would
    # leak one pinned cache entry per trigger. Checkpoint blocks are
    # GC-reclaimed when the results go out of scope.
    keys = band_keys(sigs, id_col, bands, num_perm).localCheckpoint(
        eager=True
    )  # materialized once: feeds three joins below
    on = ["band_idx", "band_hash"]
    dropped_store = (
        keys.join(band_store.select(*on), on, "left_semi")
        .select(id_col).distinct()
    )
    a, b = keys.alias("a"), keys.alias("b")
    dropped_batch = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
    )
    dropped = dropped_store.union(dropped_batch).distinct()
    survivors = new_df.join(dropped, id_col, "left_anti")
    return survivors, keys.select(*on).distinct()


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document EXACT-substring duplication (the signal behind
    suffix-array dedup, Lee et al. 2021 "Deduplicating Training Data
    Makes Language Models Better" — done Spark-shaped): fingerprint
    every ``window``-token span of every document and report the
    spans that occur in at least ``min_docs`` DISTINCT documents.
    Complements the doc-level families: MinHash approximates
    whole-document similarity; this finds verbatim shared passages
    (boilerplate, licenses, templated text) regardless of how
    different the surrounding documents are.

    Returns (fingerprint bigint, n_docs, n_occurrences) — occurrences
    count distinct (doc, span) pairs (per-doc repeats collapse; a
    doc's INTERNAL repetition is text.repetition_stats' job).

    Scale: spans are O(total tokens) rows; the only shuffle is the
    groupBy fingerprint with map-side partial aggregation — no
    pairwise anything, which is the whole advantage over a suffix
    array at 100 TB (the fingerprint multiset is linear and
    embarrassingly partitionable; the suffix array is a global sort
    of every position).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1: {min_docs}")
    sh = ensure_min_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col), _shingles_expr(text_col, window)
    )
    ex = sh.select(
        F.col(id_col), F.explode("shingles").alias("__s")
    ).select(
        F.col(id_col), F.expr(_hash64_expr("__s")).alias("fingerprint")
    )
    return (
        ex.groupBy("fingerprint")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def span_dup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 6,
) -> DataFrame:
    """Per-document duplicated-span profile: of a document's distinct
    ``window``-token spans, how many also appear in ANOTHER document —
    the per-doc filter signal derived from :func:`duplicate_spans`
    (a training pipeline drops or down-weights documents whose
    dup_fraction says they are mostly boilerplate).

    Returns (id, n_windows, dup_windows, dup_fraction) for EVERY
    input row — documents shorter than ``window`` tokens keep zeros
    with a NULL fraction. dup_fraction is one exact-integer division,
    so it is engine-reproducible without rounding.

    Plan shape (r11): ONE tokenize+explode pass. The fingerprint rows
    collapse to (fp, id) pair counts first (map-side partial agg), the
    per-fp distinct-doc count is a window over the PAIR rows (each
    pair row IS one distinct doc of its fp — no second scan, no
    countDistinct expansion, no join back to the O(tokens) explode),
    then one groupBy(id). The previous shape computed the explode
    lineage twice (once for docs-per-fp, once for the join back).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    sh = ensure_min_parallelism(df.select(id_col, text_col)).select(
        F.col(id_col), _shingles_expr(text_col, window)
    )
    ex = sh.select(
        F.col(id_col), F.explode("shingles").alias("__s")
    ).select(
        F.col(id_col), F.expr(_hash64_expr("__s")).alias("fp")
    )
    per_pair = ex.groupBy("fp", id_col).agg(F.count(F.lit(1)).alias("__c"))
    stats = (
        per_pair.withColumn(
            "__nd", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_windows"),
            F.sum(
                F.when(F.col("__nd") >= 2, F.col("__c")).otherwise(F.lit(0))
            ).alias("dup_windows"),
        )
    )
    return (
        df.select(id_col)
        .join(stats, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
            F.try_divide(
                F.coalesce("dup_windows", F.lit(0)),
                F.coalesce("n_windows", F.lit(0)),
            ).alias("dup_fraction"),
        )
    )


def _positional_spans_expr(text_col: str, k: int) -> Column:
    """ALL ``k``-token spans of lower(text) WITH their 1-indexed token
    position: array<struct<pos:int, s:string>>. The positional sibling
    of :func:`_shingles_expr` — no array_distinct (a passage repeated
    inside one document occupies two positions, and remediation must
    cut both), same split/guard/transform-binding shapes (incl. the
    CollapseProject 16x pitfall)."""
    parts = ", ".join(f"element_at(__t, i + {j})" for j in range(k))
    body = (
        f"case when size(__t) >= {k} then "
        f"transform(sequence(1, size(__t) - {k - 1}),"
        f" i -> named_struct('pos', i, 's', concat_ws(' ', {parts}))) "
        f"else cast(array() as array<struct<pos:int, s:string>>) end"
    )
    return F.expr(
        f"element_at(transform(array(split(trim(lower({text_col})), ' ')), "
        f"__t -> {body}), 1)"
    ).alias("pspans")


def _positional_fingerprints(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """(id, __pos int, fp bigint): one row per ``window``-token span
    position. O(total tokens) rows, pure Catalyst."""
    return (
        df.select(F.col(id_col), _positional_spans_expr(text_col, window))
        .select(F.col(id_col), F.explode("pspans").alias("__p"))
        .select(
            F.col(id_col),
            F.col("__p.pos").alias("__pos"),
            F.expr(_hash64_expr("__p.s")).alias("fp"),
        )
    )


def duplicate_span_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """WHERE the cross-document duplicate passages sit — the
    remediation half of Lee et al. 2021 (suffix-array dedup CUTS the
    duplicated substrings, it doesn't just drop documents).
    :func:`duplicate_spans` reports the shared fingerprints; this
    emits, per document, the merged TOKEN-COORDINATE intervals
    [token_start, token_end] (1-indexed, inclusive) covered by spans
    whose fingerprint occurs in >= ``min_docs`` distinct documents.
    Overlapping and adjacent spans are merged into maximal intervals,
    so the output is a canonical interval set — independent of scan
    or partition order (the oracle-determinism discipline).

    Returns (id, token_start long, token_end long).

    Scale shape: positional fingerprints are O(total tokens) rows; the
    dup-fingerprint set comes from one groupBy(fp) with map-side
    partial aggregation; matching positions is a fp-keyed
    shuffle join (both sides co-partitioned on fp); the interval
    merge is one window per document (a document's positions sort in
    one task — bounded by document length, not corpus size). Nothing
    is pairwise, nothing touches the driver.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1: {min_docs}")
    ex = _positional_fingerprints(
        ensure_min_parallelism(df.select(id_col, text_col)),
        id_col, text_col, window,
    )
    dup_fps = (
        ex.groupBy("fp")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("fp")
    )
    hits = ex.join(dup_fps, "fp").select(F.col(id_col), F.col("__pos"))
    w_ord = Window.partitionBy(id_col).orderBy("__pos")
    lag_pos = F.lag("__pos").over(w_ord)
    # same merged interval iff this span starts before or exactly at
    # the previous span's end + 1 (span at p covers [p, p+window-1])
    brk = F.when(
        lag_pos.isNull() | (F.col("__pos") > lag_pos + window), 1
    ).otherwise(0)
    island = F.sum(brk).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hits.withColumn("__isl", island)
        .groupBy(id_col, "__isl")
        .agg(
            F.min("__pos").cast("long").alias("token_start"),
            (F.max("__pos") + window - 1).cast("long").alias("token_end"),
        )
        .select(F.col(id_col), "token_start", "token_end")
    )


def cut_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Apply the remediation: re-emit every document with its
    cross-document duplicate passages REMOVED (the Lee et al. 2021
    ExactSubstr transform as a DataFrame op). Tokens covered by any
    :func:`duplicate_span_positions` interval are dropped; survivors
    rejoin with single spaces in original order. Tokenization is the
    family's lower/trim/split-on-space, so ``clean_text`` is the
    cleaned LOWERCASED token stream — the downstream-training
    representation, not a byte-faithful edit of the original.

    Returns (id, clean_text string, n_tokens long, removed_tokens
    long) for EVERY input document — docs with no duplicate spans
    (or with NULL text) keep removed_tokens = 0 (clean_text NULL when
    text is NULL).

    Scale shape: intervals per doc are aggregated to one array row
    (collect_list after the interval merge — bounded by tokens/window
    per doc, not corpus size), then one fp-free broadcast-less join
    back to the documents and a single Catalyst filter/transform over
    the token array. No Python in the loop.
    """
    spans = duplicate_span_positions(df, id_col, text_col, window, min_docs)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("token_start", "token_end")).alias("__iv")
    )
    toks = F.expr(f"split(trim(lower({text_col})), ' ')")
    kept = F.expr(
        "filter(transform(__toks, (t, i) -> named_struct('t', t, 'p', i + 1)),"
        " x -> __iv is null or not exists(__iv,"
        " iv -> x.p between iv.token_start and iv.token_end))"
    )
    return (
        df.select(F.col(id_col), F.col(text_col))
        .join(per_doc, id_col, "left")
        .withColumn("__toks", toks)
        .withColumn("__kept", kept)
        .select(
            F.col(id_col),
            F.when(
                F.col(text_col).isNull(), F.lit(None).cast("string")
            ).otherwise(
                F.expr("concat_ws(' ', transform(__kept, x -> x.t))")
            ).alias("clean_text"),
            F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(F.expr("size(__toks)"))
            .cast("long").alias("n_tokens"),
            F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(F.expr("size(__toks) - size(__kept)"))
            .cast("long").alias("removed_tokens"),
        )
    )


def boilerplate_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 6,
    k: int = 100,
    min_docs: int = 2,
) -> DataFrame:
    """The boilerplate CENSUS a curator eyeballs before committing a
    span-dedup pass: the ``k`` most widely shared ``window``-token
    spans across the corpus, with an example surface form. Returns
    (fingerprint, n_docs, n_occurrences, example_span), the top-k by
    (n_docs desc, n_occurrences desc, fingerprint asc) — a total
    order, so the cut line is deterministic.

    Two passes over the corpus, both linear:

    1. integer-only counting — explode span fingerprints, one
       partial-aggregating groupBy(fingerprint), then a global top-k
       (TakeOrderedAndProject: per-partition heaps, never a full
       sort). No strings ever shuffle in this pass.
    2. example lookup — re-explode spans, hash-join against the
       BROADCAST k-row top list, and take min(span) per fingerprint
       (min rather than first: deterministic under md5-collisions and
       partitioning). Only spans matching the top-k shuffle, and
       min() partial-aggregates map-side, so the exchange is k-row
       sized.

    The span definition (lowercased ``window``-token shingles,
    distinct per doc) matches :func:`duplicate_spans` — this operator
    is its human-readable head."""
    if window < 1:
        raise ValueError(f"window must be >= 1: {window}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1: {min_docs}")
    spans = df.select(
        F.col(id_col), _shingles_expr(text_col, window)
    ).select(F.col(id_col), F.explode("shingles").alias("__s"))
    fps = spans.select(
        F.col(id_col),
        F.col("__s"),
        F.expr(_hash64_expr("__s")).alias("fingerprint"),
    )
    top = (
        fps.groupBy("fingerprint")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= min_docs)
        .orderBy(
            F.desc("n_docs"), F.desc("n_occurrences"), F.asc("fingerprint")
        )
        .limit(k)
    )
    examples = (
        fps.join(F.broadcast(top.select("fingerprint")), "fingerprint")
        .groupBy("fingerprint")
        .agg(F.min("__s").alias("example_span"))
    )
    return top.join(examples, "fingerprint").select(
        "fingerprint", "n_docs", "n_occurrences", "example_span"
    )
