"""Token-budget shard packing: assign documents to training shards.

The standard last step of an LLM training-data pipeline: put the
corpus in a deterministic pseudo-random order, then cut it into
shards of a fixed token budget (each shard is one training file /
sequence-packing unit). No reference-engine equivalent (the
reference stops at SQL operators); this is part of the engine's
first-class data-pipeline family alongside dedup/similarity/text.

Scale design (100 TB): a naive ``sum(n) OVER (ORDER BY key)`` is a
single-partition global sort — a non-starter. Instead the global
prefix sum is computed hierarchically:

1. bucket = leading hex byte(s) of the order key, so buckets
   partition the global order into contiguous ranges;
2. within-bucket cumulative sums — a window partitioned BY bucket
   (shuffles once on bucket, sorts locally; ``n_buckets`` chosen so a
   bucket's documents fit one task comfortably);
3. bucket offsets — a window over the ``n_buckets``-row totals
   aggregate (single partition over ≤64 Ki tiny rows: negligible);
4. broadcast-join offsets back; global position = offset + local
   cumsum.

The same decomposition Spark itself uses for ``zipWithIndex``, but
expressed declaratively so Catalyst fuses steps 1-2 with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_efo_spark.operators.text import _tokens


def pack_shards(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shard_tokens: int,
    n_buckets: int = 256,
    counter: str = "whitespace",
) -> DataFrame:
    """Deterministic token-budget shard assignment.

    Returns (id, n_tokens, start_pos, shard_id): documents are laid
    out in (md5(id), id) order — a stable corpus shuffle — and
    ``shard_id = floor(start_pos / shard_tokens)`` where ``start_pos``
    is the document's global token offset. A shard's token total is
    bounded by ``shard_tokens`` + one document's overflow (documents
    are not split).

    ``counter`` picks what a "token" is: ``"whitespace"`` (the split
    count) or ``"bpe_estimate"`` (text._bpe_estimate_expr — the GPT-2
    pre-tokenizer + per-class costs, so budgets track what a real BPE
    tokenizer will produce; NULL text counts 0).

    ``n_buckets`` must be a power of 16 divisor of the hex keyspace:
    it is realized as a hex-prefix of the md5 key (1 char = 16
    buckets, 2 = 256, 3 = 4096). Raise for very large corpora so
    per-bucket sorts stay small.
    """
    return _global_token_layout(
        df, id_col, text_col, n_buckets, counter
    ).withColumn(
        "shard_id", F.floor(F.col("start_pos") / F.lit(shard_tokens))
    ).select(id_col, "n_tokens", "start_pos", "shard_id")


def _global_token_layout(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    counter: str,
) -> DataFrame:
    """(id, n_tokens, start_pos): every document's exact global token
    offset in the deterministic (md5(id), id) corpus order, via the
    hierarchical bucketed prefix sum described in the module
    docstring. Shared by pack_shards and pack_sequences."""
    hex_chars = {16: 1, 256: 2, 4096: 3, 65536: 4}.get(n_buckets)
    if hex_chars is None:
        raise ValueError("n_buckets must be one of 16, 256, 4096, 65536")
    if counter == "whitespace":
        n_tok = F.expr(f"size({_tokens(text_col)})")
    elif counter == "bpe_estimate":
        from flink_efo_spark.operators.text import _bpe_estimate_expr

        n_tok = F.coalesce(_bpe_estimate_expr(text_col), F.lit(0))
    else:
        raise ValueError(
            f"counter must be whitespace | bpe_estimate, got {counter!r}"
        )

    keyed = df.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__okey"),
    ).withColumn("__bucket", F.substring("__okey", 1, hex_chars))

    w_in = (
        Window.partitionBy("__bucket")
        .orderBy("__okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = keyed.withColumn("__cum_in", F.sum("n_tokens").over(w_in))

    totals = keyed.groupBy("__bucket").agg(F.sum("n_tokens").alias("__tot"))
    # single-partition window, but over <= n_buckets rows — bounded
    # and tiny by construction, never the data itself
    w_b = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bucket",
        F.coalesce(F.sum("__tot").over(w_b), F.lit(0)).alias("__offset"),
    )

    return (
        local.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "start_pos",
            F.col("__offset") + F.col("__cum_in") - F.col("n_tokens"),
        )
        .select(id_col, "n_tokens", "start_pos")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seq_len: int,
    n_buckets: int = 256,
    counter: str = "whitespace",
) -> DataFrame:
    """Fixed-length training-sequence packing: the doc→sequence
    SEGMENT MAP a trainer's data loader consumes. The corpus is laid
    out in the deterministic (md5(id), id) order (same layout as
    :func:`pack_shards`), the concatenated token stream is cut into
    fixed windows of ``seq_len`` tokens, and every document emits one
    row per training sequence it overlaps:

    * seq_id ....... floor(position / seq_len) of the window
    * doc_offset ... first token of this segment, 0-based within the doc
    * seq_offset ... where that token lands, 0-based within the sequence
    * seg_len ...... tokens of this doc inside this sequence (>= 1)

    Unlike pack_shards (documents never split), sequences cut THROUGH
    documents — exactly what next-token training wants; the map is
    the join index for building input tensors. Documents with 0
    tokens (empty or NULL text) occupy no positions and emit no rows.
    Output size = n_docs + total_tokens/seq_len segment rows (each
    doc adds at most its window crossings + 1).

    Exact integer arithmetic end to end: positions come from the
    hierarchical prefix sum, window ids are floor divisions, and the
    per-window explode is ``sequence(first_win, last_win)`` — a
    narrow generator whose fan-out is bounded by ceil(n_tokens /
    seq_len) + 1 per document. No new shuffle beyond the layout's.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1: {seq_len}")
    pos = _global_token_layout(df, id_col, text_col, n_buckets, counter)
    L = F.lit(int(seq_len)).cast("bigint")
    end = F.col("start_pos") + F.col("n_tokens")  # exclusive
    segs = (
        pos.where(F.col("n_tokens") > 0)
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.expr(f"start_pos div {int(seq_len)}"),
                    F.expr(
                        f"(start_pos + n_tokens - 1) div {int(seq_len)}"
                    ),
                )
            ),
        )
        .withColumn("__wstart", F.col("seq_id") * L)
    )
    seg_first = F.greatest(F.col("start_pos"), F.col("__wstart"))
    return segs.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("seq_id").cast("long"),
        (seg_first - F.col("start_pos")).cast("long").alias("doc_offset"),
        (seg_first - F.col("__wstart")).cast("long").alias("seq_offset"),
        (
            F.least(end, F.col("__wstart") + L) - seg_first
        ).cast("long").alias("seg_len"),
    )


def shard_manifest(assignments: DataFrame) -> DataFrame:
    """Per-shard manifest from ``pack_shards`` output: document count,
    token total, and token span — what a downstream trainer reads to
    plan file writes. Pure hash aggregate on shard_id (map-side
    partial combine; scales)."""
    return assignments.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("start_pos").alias("first_pos"),
        F.max(F.col("start_pos") + F.col("n_tokens")).alias("end_pos"),
    )


def sequence_manifest(segments: DataFrame, seq_len: int) -> DataFrame:
    """Per-sequence manifest from :func:`pack_sequences` output — the
    integrity view a data loader checks before training: how many
    documents contribute to each sequence, the filled token count,
    and whether the window is exactly full (every sequence must be,
    except the single tail). Returns (seq_id, n_docs, filled_tokens,
    is_full), one row per sequence.

    Pure hash aggregate on seq_id with map-side partial combine; the
    fill check is ``filled_tokens = seq_len`` — exact integers."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1: {seq_len}")
    return segments.groupBy("seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("seg_len").cast("long").alias("filled_tokens"),
        (F.sum("seg_len") == F.lit(int(seq_len))).alias("is_full"),
    )
