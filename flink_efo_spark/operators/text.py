"""Text-analysis operators for training-data pipelines.

Beyond the reference's relational surface (north-star extension):
language ID, quality scoring, token counting, and document
fingerprinting over the ``documents`` table.

Everything is built-in Catalyst expressions — regex + array
functions, no Python UDFs — so the operators whole-stage-codegen and
are bit-reproducible against a DuckDB oracle. All regexes are kept to
the common subset of Java regex (Spark) and RE2 (DuckDB).

Scale: each operator is a narrow map over the documents scan — no
shuffle at all except ``doc_fingerprint``'s optional dedup join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-overlap
# language heuristic. Deliberately small: the heuristic is a scoring
# demo, not a lingua port.
_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}

# whitespace tokenizer + a BPE-ish word/number/punct splitter; the
# pattern is identical in Java regex and RE2
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _tokens(text_col: str) -> str:
    return f"filter(split(trim(lower({text_col})), ' +'), t -> t != '')"


# GPT-2-family byte-BPE pre-tokenizer (the tiktoken/GPT-2 split
# regex, minus its whitespace-lookahead branches — RE2, hence DuckDB,
# has no lookahead; the trailing \s+ branch absorbs what they would
# have split, which only affects how WHITESPACE runs are grouped, not
# the letter/digit/punct pieces): contractions, optionally
# space-prefixed letter runs, digit runs, punctuation runs, leftover
# whitespace runs. Identical in Java regex and RE2.
_BPE_PRETOKEN = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?\\p{L}+"
    "| ?\\p{N}+"
    "| ?[^\\s\\p{L}\\p{N}]+"
    "|\\s+"
)


def _bpe_estimate_expr(text_col: str) -> Column:
    """Estimated byte-BPE token count of ``text_col`` as one Catalyst
    expression (bigint; NULL for NULL text): split with the GPT-2
    pre-tokenizer, then charge each piece a per-class integer cost.

    The per-class costs approximate cl100k-family English behavior
    (~4 chars/token overall; digit groups of <= 3; most punct runs 1-2
    chars/token) and are the CALIBRATION KNOBS — fit them offline
    against your real tokenizer on a corpus sample and adjust here:

    * contraction piece ('s 't 're 've 'm 'll 'd) ... 1
    * letter run of core length c .... max(1, ceil(c/4) - 1)
    * digit run of core length c ..... ceil(c/3)
    * other/punct run of core length c ... ceil(c/2)
    * whitespace run ................. 1

    (core length excludes the absorbed leading space.) All arithmetic
    is exact-integer, so the count is engine-reproducible — the DuckDB
    oracle replays the same regex (RE2) and the same CASE arithmetic.
    """
    pieces = F.regexp_extract_all(
        F.col(text_col), F.lit(_BPE_PRETOKEN), F.lit(0)
    )

    def cost(p: Column) -> Column:
        core = F.when(
            F.substring(p, 1, 1) == " ", F.length(p) - 1
        ).otherwise(F.length(p))
        head = F.when(
            F.substring(p, 1, 1) == " ", F.substring(p, 2, 1)
        ).otherwise(F.substring(p, 1, 1))
        return (
            F.when(p.rlike("^'(?:s|t|re|ve|m|ll|d)$"), F.lit(1))
            .when(head.rlike("^\\s"), F.lit(1))
            .when(
                head.rlike("^\\p{L}"),
                F.greatest(F.lit(1), F.floor((core + 3) / 4) - 1),
            )
            .when(head.rlike("^\\p{N}"), F.floor((core + 2) / 3))
            .otherwise(F.floor((core + 1) / 2))
            .cast("long")
        )

    return F.when(
        F.col(text_col).isNull(), F.lit(None).cast("long")
    ).otherwise(
        F.aggregate(
            F.transform(pieces, cost),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    )


def bpe_token_estimate(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Tokenizer-faithful token counting for budget planning: the
    whitespace count under-charges code/punct/numbers and a real BPE
    run is not available engine-side, so estimate with the GPT-2
    pre-tokenizer + per-class costs (:func:`_bpe_estimate_expr` —
    constants are offline-calibration knobs). Feeds
    :func:`flink_efo_spark.operators.packing.pack_shards`
    (``counter="bpe_estimate"``) so shard budgets track what the
    trainer's tokenizer will actually produce.

    Returns (id, bpe_est_tokens bigint, n_pieces bigint, ws_tokens
    bigint) — ws_tokens is the whitespace count for drift comparison.

    Scale shape: one regex split + one array fold per row — a narrow
    map, whole-stage codegen, no shuffle.
    """
    toks = _tokens(text_col)
    null_long = F.lit(None).cast("long")
    is_null = F.col(text_col).isNull()
    return df.select(
        F.col(id_col),
        _bpe_estimate_expr(text_col).alias("bpe_est_tokens"),
        F.when(is_null, null_long)
        .otherwise(
            F.size(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(_BPE_PRETOKEN), F.lit(0)
                )
            ).cast("long")
        ).alias("n_pieces"),
        F.when(is_null, null_long)
        .otherwise(F.expr(f"size({toks})").cast("long"))
        .alias("ws_tokens"),
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token/char statistics.

    Returns (id, n_chars_calc, n_tokens, n_types, avg_token_len,
    bpe_tokens) — ``n_types`` is the distinct-token count and
    ``bpe_tokens`` the count under the BPE-ish regex splitter.
    """
    toks = _tokens(text_col)
    return df.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars_calc"),
        F.expr(f"size({toks})").cast("bigint").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").cast("bigint").alias("n_types"),
        F.round(
            F.expr(
                f"aggregate({toks}, cast(0.0 as double), (a, t) -> a + length(t))"
                f" / greatest(size({toks}), 1)"
            ),
            4,
        ).alias("avg_token_len"),
        F.expr(f"size(regexp_extract_all({text_col}, '{_BPE_PATTERN}', 0))")
        .cast("bigint")
        .alias("bpe_tokens"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Duplicate n-gram fraction per document — the standard
    "repetitious text" training-data filter (high ratio = boilerplate
    / degenerate generation). Returns (id, n_ngrams, n_distinct_ngrams,
    rep_ratio) with ``rep_ratio = 1 - distinct/total`` (0 when the doc
    has fewer than ``n`` tokens).

    Pure Catalyst: tokenization + sequence/slice n-gram construction +
    array_distinct, a narrow map over the scan — no shuffle, no
    Python."""
    toks = _tokens(text_col)
    ngrams = (
        f"case when size({toks}) >= {n} then "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"else cast(array() as array<string>) end"
    )
    total = F.expr(f"size({ngrams})").cast("bigint")
    distinct = F.expr(f"size(array_distinct({ngrams}))").cast("bigint")
    ratio = F.when(total == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - distinct / total, 4)
    )
    return df.select(
        F.col(id_col),
        total.alias("n_ngrams"),
        distinct.alias("n_distinct_ngrams"),
        ratio.alias("rep_ratio"),
    )


def quality_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality signals: punctuation / digit / stopword
    ratios + a composite score in [0, 1], rounded for cross-engine
    hash stability.

    Mirrors the shape of common corpus-quality filters (length,
    symbol ratio, stopword presence).
    """
    toks = _tokens(text_col)
    en = ", ".join(f"'{w}'" for w in _LANG_STOPWORDS["en"])
    n_chars = F.length(F.col(text_col))
    punct = F.expr(f"size(regexp_extract_all({text_col}, '[^A-Za-z0-9 ]', 0))")
    digits = F.expr(f"size(regexp_extract_all({text_col}, '[0-9]', 0))")
    stop = F.expr(
        f"size(filter({toks}, t -> array_contains(array({en}), t)))"
    )
    ntok = F.expr(f"size({toks})")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    digit_ratio = digits / F.greatest(n_chars, F.lit(1))
    stop_ratio = stop / F.greatest(ntok, F.lit(1))
    len_score = F.least(ntok / F.lit(100.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return df.select(
        F.col(id_col),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def gopher_quality_flags(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The Gopher/MassiveWeb quality-filter ruleset (Rae et al. 2021,
    arXiv:2112.11446, Appendix A1.1 — the canonical pretraining
    heuristics later reused by Falcon/FineWeb pipelines) as ONE
    Catalyst projection of per-rule booleans:

    * ok_word_count ........ 50 <= words <= 100,000
    * ok_mean_word_len ..... mean word length in [3, 10]
    * ok_symbol_ratio ...... ('#' or ellipsis) / words <= 0.1
    * ok_bullet_lines ...... NOT (> 90% of lines start with a bullet)
    * ok_ellipsis_lines .... NOT (> 30% of lines end with an ellipsis)
    * ok_alpha_words ....... >= 80% of words contain a letter
    * ok_stopwords ......... >= 2 distinct of the paper's 8 stop words
                             (the be to of and that have with)
    * keep ................. all of the above

    Every threshold compares CROSS-MULTIPLIED integers (3n <= Σlen,
    bullets*10 <= 9*lines, ...) — no float anywhere, so the flags are
    engine-exact and the DuckDB oracle replays them verbatim. NULL
    text fails every rule (keep = false).

    Scale shape: one split + a handful of array folds per row — a
    narrow map inside whole-stage codegen, no shuffle.
    """
    words = f"filter(split({text_col}, '\\\\s+'), w -> w != '')"
    lines = f"split({text_col}, '\\n')"
    nw = f"size({words})"
    nl = f"size({lines})"
    sum_len = (
        f"aggregate({words}, cast(0 as bigint), (a, w) -> a + length(w))"
    )
    symbols = f"size(regexp_extract_all({text_col}, '#|\\\\.\\\\.\\\\.|…', 0))"
    bullets = f"size(filter({lines}, l -> l rlike '^\\\\s*[-*•]'))"
    ellipsis = (
        f"size(filter({lines}, l -> l rlike '(\\\\.\\\\.\\\\.|…)\\\\s*$'))"
    )
    alpha = f"size(filter({words}, w -> w rlike '\\\\p{{L}}'))"
    stops = (
        f"size(array_intersect("
        f"transform({words}, w -> lower(w)), "
        f"array('the','be','to','of','and','that','have','with')))"
    )
    nn = F.col(text_col).isNotNull()
    out = df.select(
        F.col(id_col),
        F.when(nn, F.expr(nw)).otherwise(F.lit(0))
        .cast("long").alias("n_words"),
        (nn & F.expr(f"{nw} between 50 and 100000"))
        .alias("ok_word_count"),
        (nn & F.expr(
            f"{nw} > 0 and 3 * {nw} <= {sum_len} and {sum_len} <= 10 * {nw}"
        )).alias("ok_mean_word_len"),
        (nn & F.expr(f"10 * {symbols} <= {nw}")).alias("ok_symbol_ratio"),
        (nn & F.expr(f"10 * {bullets} <= 9 * {nl}")).alias("ok_bullet_lines"),
        (nn & F.expr(f"10 * {ellipsis} <= 3 * {nl}"))
        .alias("ok_ellipsis_lines"),
        (nn & F.expr(f"10 * {alpha} >= 8 * {nw}")).alias("ok_alpha_words"),
        (nn & F.expr(f"{stops} >= 2")).alias("ok_stopwords"),
    )
    rule_cols = [c for c in out.columns if c.startswith("ok_")]
    keep = rule_cols[0]
    acc = F.col(keep)
    for c in rule_cols[1:]:
        acc = acc & F.col(c)
    return out.withColumn("keep", acc)


def _chars_fold(arr: str) -> str:
    """Total character count of a string array, as one aggregate fold."""
    return f"aggregate({arr}, cast(0 as bigint), (a, x) -> a + length(x))"


# (n-gram size, max char-fraction * 100) — Gopher A1.1 Table A1.
_GOPHER_TOP_NGRAM = [(2, 20), (3, 18), (4, 16)]
_GOPHER_DUP_NGRAM = [(5, 15), (6, 14), (7, 13), (8, 12), (9, 11), (10, 10)]


def _word_grams(words_var: str, n: int) -> str:
    """Space-joined word n-grams of a bound token-array lambda var."""
    return (
        f"case when size({words_var}) >= {n} then "
        f"transform(sequence(1, size({words_var}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words_var}, i, {n}))) "
        f"else cast(array() as array<string>) end"
    )


def gopher_repetition_flags(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The Gopher/MassiveWeb REPETITION-filter ruleset (Rae et al.
    2021, arXiv:2112.11446, Appendix A1.1 Table A1 — the companion of
    :func:`gopher_quality_flags`, reused by Falcon/FineWeb/Dolma
    pipelines): per-document duplicate-content signals + per-rule
    booleans + the combined keep flag.

    * ok_dup_lines ......... duplicate-line fraction <= 0.30
    * ok_dup_paras ......... duplicate-paragraph fraction <= 0.30
    * ok_dup_line_chars .... chars in duplicate lines / line chars <= 0.20
    * ok_dup_para_chars .... chars in duplicate paragraphs <= 0.20
    * ok_top{2,3,4}_gram ... chars covered by the highest-coverage
                             repeated word n-gram / chars <= .20/.18/.16
    * ok_dup{5..10}_gram ... chars in repeated-n-gram occurrences
                             beyond the first / chars <= .15/.14/.13/.12/.11/.10

    Deviations from the paper's (unpublished) exact procedure, chosen
    so both engines replay bit-for-bit:

    * "duplicate" metrics use the set identity — occurrences beyond
      the first = total - distinct, char-weighted as
      ``sum(len(all)) - sum(len(distinct))`` — instead of a greedy
      left-to-right scan (the paper does not pin one);
    * "top n-gram" coverage is ``max(count * chars)`` over n-grams
      with count >= 2 (deterministic; ``most_common(1)`` tie-breaks
      are engine-ordering-dependent), 0 when nothing repeats;
    * lines split on '\\n', paragraphs on '\\n\\n', words on
      whitespace (raw text, no lowering); gram-fraction denominators
      use ``length(text)``, line/para-fraction denominators use the
      summed piece lengths.

    Every threshold compares CROSS-MULTIPLIED integers (10*dup <=
    3*n, 100*cover <= 16*chars, ...) — no float anywhere. NULL text
    fails every rule (keep = false), matching gopher_quality_flags.

    Scale shape: the line/para/dup-gram metrics are narrow per-row
    folds (token arrays bound once via the transform(array(..))
    binder — the CollapseProject pitfall at dedup._shingles_expr).
    The top-gram mode is the one metric that genuinely needs exact
    per-key counts, so it is computed distributed: explode (doc, n,
    md5-60bit-fingerprint, len) for n=2,3,4 → partial-aggregating
    groupBy → per-doc conditional max → one co-keyed left join back.
    Linear in corpus size; shuffle rows = word count * 3 pre-combine,
    with fixed-width integer keys, never gram strings.
    """
    words = f"filter(split({text_col}, '\\\\s+'), w -> w != '')"
    lines = f"split({text_col}, '\n')"
    paras = f"split({text_col}, '\n\n')"

    def bind(arr: str, var: str, body: str) -> str:
        return f"element_at(transform(array({arr}), {var} -> {body}), 1)"

    def dup_count(arr: str) -> str:
        return f"size({arr}) - size(array_distinct({arr}))"

    def dup_chars(var: str) -> str:
        return f"{_chars_fold(var)} - {_chars_fold(f'array_distinct({var})')}"

    nn = F.col(text_col).isNotNull()

    def cnt(expr: str) -> Column:
        return (
            F.when(nn, F.expr(expr)).otherwise(F.lit(0)).cast("long")
        )

    counted = df.select(
        F.col(id_col),
        nn.alias("__nn"),
        F.when(nn, F.length(text_col)).otherwise(F.lit(0))
        .cast("long").alias("n_chars"),
        cnt(f"size({lines})").alias("n_lines"),
        cnt(bind(lines, "__l", dup_count("__l"))).alias("dup_lines"),
        cnt(bind(lines, "__l", _chars_fold("__l"))).alias("line_chars"),
        cnt(bind(lines, "__l", dup_chars("__l"))).alias("dup_line_chars"),
        cnt(f"size({paras})").alias("n_paras"),
        cnt(bind(paras, "__p", dup_count("__p"))).alias("dup_paras"),
        cnt(bind(paras, "__p", _chars_fold("__p"))).alias("para_chars"),
        cnt(bind(paras, "__p", dup_chars("__p"))).alias("dup_para_chars"),
        *[
            cnt(
                bind(
                    words,
                    "__w",
                    bind(_word_grams("__w", n), "__g", dup_chars("__g")),
                )
            ).alias(f"dup{n}_chars")
            for n, _ in _GOPHER_DUP_NGRAM
        ],
    )

    # distributed exact mode for the top-{2,3,4}-gram coverage
    fp = "cast(conv(substr(md5(g), 1, 15), 16, 10) as bigint)"
    gram_structs = ", ".join(
        f"transform({_word_grams('__w', n)}, "
        f"g -> named_struct('n', {n}, 'fp', {fp}, "
        f"'len', length(g)))"
        for n, _ in _GOPHER_TOP_NGRAM
    )
    exploded = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"element_at(transform(array({words}), "
                f"__w -> flatten(array({gram_structs}))), 1)"
            )
        ).alias("__g"),
    )
    covers = (
        exploded.groupBy(id_col, "__g.n", "__g.fp")
        .agg(F.count("*").alias("__c"), F.max("__g.len").alias("__len"))
        .groupBy(id_col)
        .agg(
            *[
                F.max(
                    F.when(
                        (F.col("n") == n) & (F.col("__c") >= 2),
                        F.col("__c") * F.col("__len"),
                    )
                ).cast("long").alias(f"top{n}_cover")
                for n, _ in _GOPHER_TOP_NGRAM
            ]
        )
    )
    full = counted.join(covers, id_col, "left").select(
        *[F.col(c) for c in counted.columns],
        *[
            F.coalesce(F.col(f"top{n}_cover"), F.lit(0))
            .cast("long").alias(f"top{n}_cover")
            for n, _ in _GOPHER_TOP_NGRAM
        ],
    )

    flags: list[tuple[str, Column]] = [
        (
            "ok_dup_lines",
            F.lit(10) * F.col("dup_lines") <= F.lit(3) * F.col("n_lines"),
        ),
        (
            "ok_dup_paras",
            F.lit(10) * F.col("dup_paras") <= F.lit(3) * F.col("n_paras"),
        ),
        (
            "ok_dup_line_chars",
            F.lit(10) * F.col("dup_line_chars")
            <= F.lit(2) * F.col("line_chars"),
        ),
        (
            "ok_dup_para_chars",
            F.lit(10) * F.col("dup_para_chars")
            <= F.lit(2) * F.col("para_chars"),
        ),
        *[
            (
                f"ok_top{n}_gram",
                F.lit(100) * F.col(f"top{n}_cover")
                <= F.lit(pct) * F.col("n_chars"),
            )
            for n, pct in _GOPHER_TOP_NGRAM
        ],
        *[
            (
                f"ok_dup{n}_gram",
                F.lit(100) * F.col(f"dup{n}_chars")
                <= F.lit(pct) * F.col("n_chars"),
            )
            for n, pct in _GOPHER_DUP_NGRAM
        ],
    ]
    out = full.select(
        *[F.col(c) for c in full.columns if c != "__nn"],
        *[(F.col("__nn") & f).alias(name) for name, f in flags],
    )
    rule_cols = [c for c in out.columns if c.startswith("ok_")]
    acc = F.col(rule_cols[0])
    for c in rule_cols[1:]:
        acc = acc & F.col(c)
    return out.withColumn("keep", acc)


def c4_clean(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The C4 line/page cleaning rules (Raffel et al. 2020,
    arXiv:1910.10683 §2.2 — the canonical heuristic set behind C4,
    reused by Pile/RedPajama derivatives), as one shuffle-free
    Catalyst projection. LINE rules (a line survives iff ALL hold):

    * ends with terminal punctuation (. ! ? or a closing quote),
    * has at least 5 words,
    * does not contain the word "javascript" (case-insensitive).

    PAGE rules (flags; a page is kept iff all hold AND it retains at
    least 3 surviving sentences):

    * no curly brace '{' anywhere (code),
    * no "lorem ipsum" (case-insensitive).

    Returns (id, clean_text, n_lines, kept_lines, n_sentences,
    has_brace, has_lorem, keep) — clean_text is the surviving lines
    re-joined with newlines (NULL for NULL text), n_sentences counts
    terminal-punctuation marks in the surviving text (the cheap
    sentence proxy, documented). All counts exact integers; the line
    filter preserves order in both engines, so clean_text compares
    exactly.

    Scale shape: one line split + per-line regex predicates + one
    rejoin per row — a narrow map, whole-stage codegen, no shuffle.
    """
    lines = f"split({text_col}, '\\n')"
    keep_line = (
        "l -> l rlike '[.!?][\"’”]?\\\\s*$'"
        " and size(filter(split(l, '\\\\s+'), w -> w != '')) >= 5"
        " and not lower(l) rlike 'javascript'"
    )
    kept = f"filter({lines}, {keep_line})"
    clean = f"concat_ws('\\n', {kept})"
    nn = F.col(text_col).isNotNull()
    n_sent = f"size(regexp_extract_all({clean}, '[.!?]', 0))"
    has_brace = F.expr(f"contains({text_col}, '{{')")
    has_lorem = F.expr(f"contains(lower({text_col}), 'lorem ipsum')")
    return df.select(
        F.col(id_col),
        F.when(nn, F.expr(clean)).alias("clean_text"),
        F.when(nn, F.expr(f"size({lines})")).otherwise(F.lit(0))
        .cast("long").alias("n_lines"),
        F.when(nn, F.expr(f"size({kept})")).otherwise(F.lit(0))
        .cast("long").alias("kept_lines"),
        F.when(nn, F.expr(n_sent)).otherwise(F.lit(0))
        .cast("long").alias("n_sentences"),
        (nn & has_brace).alias("has_brace"),
        (nn & has_lorem).alias("has_lorem"),
        (
            nn
            & ~has_brace
            & ~has_lorem
            & F.expr(f"{n_sent} >= 3")
        ).alias("keep"),
    )


def logistic_probe_scores(
    df: DataFrame,
    id_col: str,
    label_col: str,
    feature_cols: tuple[str, str],
    quant: int = 10_000,
) -> DataFrame:
    """Quality-classifier calibration as a ONE-STEP-NEWTON logistic
    probe (Newton/IRLS from w = 0, where the step has the closed form
    ``w = 2 (X'X)^{-1} X'(2y-1)``): fit a logistic map from two
    bounded quality features (+ intercept) to a held-out binary
    label, and emit every document's calibrated LOGIT (monotone in
    the probability, so thresholding/ranking-equivalent — sigmoid is
    deliberately not applied: exp() is libm-dependent and would break
    cross-engine hashing).

    Determinism design (the corpus discipline): features are
    quantized to ``quant`` units so every sufficient statistic
    (the six X'X entries and three X'(2y-1) entries) is an EXACT
    integer sum — no float-addition-order dependence; the 3x3 Cramer
    solve and the per-doc dot product are short FIXED-ORDER float
    expressions over those integers that an oracle replays verbatim;
    the logit is rounded to 6 decimals.

    Bounds: with |feature| <= 1 the X'X sums are <= quant^2 * n —
    int64-safe to n ~ 9e10 docs at the default quant; lower quant at
    extreme scale.

    Scale shape: one partial-combine aggregation into a SINGLE
    9-number row (the 1-row driver collect is KB metadata, the
    centroid-literal precedent), then a narrow scoring map. Two
    corpus scans, no shuffle beyond the agg.
    """
    if quant < 1:
        raise ValueError(f"quant must be >= 1: {quant}")
    f1, f2 = feature_cols
    base = df.select(
        F.col(id_col),
        (F.lit(2) * F.col(label_col).cast("long") - 1).alias("__s"),
        F.lit(int(quant)).cast("long").alias("__x0"),
        F.round(F.col(f1) * quant, 0).cast("long").alias("__x1"),
        F.round(F.col(f2) * quant, 0).cast("long").alias("__x2"),
    )
    r = base.agg(
        F.sum(F.col("__x0") * F.col("__x0")).alias("s00"),
        F.sum(F.col("__x0") * F.col("__x1")).alias("s01"),
        F.sum(F.col("__x0") * F.col("__x2")).alias("s02"),
        F.sum(F.col("__x1") * F.col("__x1")).alias("s11"),
        F.sum(F.col("__x1") * F.col("__x2")).alias("s12"),
        F.sum(F.col("__x2") * F.col("__x2")).alias("s22"),
        F.sum(F.col("__x0") * F.col("__s")).alias("g0"),
        F.sum(F.col("__x1") * F.col("__s")).alias("g1"),
        F.sum(F.col("__x2") * F.col("__s")).alias("g2"),
    ).collect()[0]
    if r.s00 is None:
        raise ValueError("logistic_probe_scores: empty input")
    # fixed-order cofactor expansion — the oracle mirrors this exact
    # expression over the same exact-integer sums
    a, b, c = float(r.s00), float(r.s01), float(r.s02)
    d, e, f = float(r.s01), float(r.s11), float(r.s12)
    g, h, i = float(r.s02), float(r.s12), float(r.s22)
    det = a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    if det == 0.0:
        raise ValueError(
            "logistic_probe_scores: singular X'X (a feature is "
            "constant or collinear) — pick independent features"
        )
    g0, g1, g2 = float(r.g0), float(r.g1), float(r.g2)
    u0 = (
        g0 * (e * i - f * h) - b * (g1 * i - f * g2) + c * (g1 * h - e * g2)
    ) / det
    u1 = (
        a * (g1 * i - f * g2) - g0 * (d * i - f * g) + c * (d * g2 - g1 * g)
    ) / det
    u2 = (
        a * (e * g2 - g1 * h) - b * (d * g2 - g1 * g) + g0 * (d * h - e * g)
    ) / det
    z = (
        F.col("__x0") * F.lit(u0)
        + F.col("__x1") * F.lit(u1)
        + F.col("__x2") * F.lit(u2)
    ) * 2
    return base.select(F.col(id_col), F.round(z, 6).alias("logit"))


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-overlap language guess: argmax over per-language
    stopword hit counts (ties → lexicographically first language;
    zero hits → 'und' undetermined)."""
    toks = _tokens(text_col)
    score_cols = []
    for lang, words in sorted(_LANG_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        score_cols.append(
            F.expr(
                f"size(filter({toks}, t -> array_contains(array({lst}), t)))"
            ).alias(f"__s_{lang}")
        )
    scored = df.select(F.col(id_col), *score_cols)
    langs = sorted(_LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"__s_{lang}") for lang in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        pick = pick.when(F.col(f"__s_{lang}") == best, F.lit(lang))
    return scored.select(
        F.col(id_col),
        pick.alias("lang_guess"),
        best.cast("bigint").alias("lang_hits"),
    )


# PII patterns: common Java-regex / RE2 subset (no lookaround, no
# backrefs) so Spark and the DuckDB oracle agree byte-for-byte.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
_IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def normalize_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pipeline text normalization: casefold, punctuation → space,
    whitespace collapse, trim. Returns (id, norm_text, norm_hash) —
    ``norm_hash`` is the md5 of the normalized body, the join/dedup
    key for *normalized* exact dedup (catches case/punctuation
    variants that raw-hash dedup misses).

    Scale: narrow map over the scan, whole-stage codegen; downstream
    dedup shuffles the 32-char hash only, never bodies."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return df.select(
        F.col(id_col), norm.alias("norm_text"), F.md5(norm).alias("norm_hash")
    )


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """PII redaction: replace emails / dashed phone numbers / IPv4
    addresses with typed placeholder tokens and count what was found.

    Returns (id, n_emails, n_phones, n_ips, n_residual, clean_hash):
    ``n_residual`` re-scans the CLEAN text for any surviving match
    (the self-check a redaction pass should always ship with) and
    ``clean_hash`` is the md5 of the redacted body.

    All regex built-ins (no UDF): the operator is a narrow
    codegen-friendly map, zero shuffle, linear in corpus size."""
    c = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
        ),
        _IP_RE,
        "<IP>",
    )

    def _count(src: Column, pat: str) -> Column:
        # idx=0 (full match): Spark's regexp_extract_all defaults to
        # group 1 and throws on group-less patterns under ANSI
        return F.size(
            F.regexp_extract_all(src, F.lit(pat), F.lit(0))
        ).cast("bigint")

    any_pii = f"({_EMAIL_RE})|({_PHONE_RE})|({_IP_RE})"
    return df.select(
        F.col(id_col),
        _count(c, _EMAIL_RE).alias("n_emails"),
        _count(c, _PHONE_RE).alias("n_phones"),
        _count(c, _IP_RE).alias("n_ips"),
        _count(clean, any_pii).alias("n_residual"),
        F.md5(clean).alias("clean_hash"),
    )


def ngram_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``shingle_size``-gram with an evaluation set — the standard
    n-gram-collision check run before training on scraped data.

    Returns (id, hit_ngrams) for contaminated docs only; shingles are
    distinct per doc (see ``_shingles_expr``) so ``hit_ngrams`` is the
    number of distinct colliding n-grams.

    100 TB design: the eval side (benchmark suites, ~MBs) collapses to
    a DISTINCT shingle set and is BROADCAST; the corpus side explodes
    shingles and hash-joins locally — no corpus shuffle at all until
    the final per-doc count (which shuffles (doc_id, 1) pairs only).
    """
    from flink_efo_spark.operators.dedup import _shingles_expr

    ev = (
        eval_df.select(_shingles_expr(text_col, shingle_size))
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    co = corpus.select(
        F.col(id_col), _shingles_expr(text_col, shingle_size)
    ).select(F.col(id_col), F.explode("shingles").alias("shingle"))
    return (
        co.join(F.broadcast(ev), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("hit_ngrams"))
    )


def doc_fingerprint(
    df: DataFrame, id_col: str, text_col: str, shingle_size: int = 3
) -> DataFrame:
    """Winnowing-style fingerprint: the minimum (and count of
    distinct) 64-bit rolling shingle hashes per document. Two docs
    sharing ``fp_min`` share at least one k-shingle — a cheap
    first-pass near-dup blocking key.

    Hash = md5-derived (portable across engines, see dedup.py).
    """
    from flink_efo_spark.operators.dedup import _hash64_expr, _shingles_expr

    h = _hash64_expr("s")
    return (
        df.select(F.col(id_col), _shingles_expr(text_col, shingle_size))
        .select(
            F.col(id_col),
            F.expr(f"array_min(transform(shingles, s -> {h}))").alias("fp_min"),
            F.expr("size(shingles)").cast("bigint").alias("fp_count"),
        )
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a query term
    set — the retrieval scorer a training-data pipeline runs for
    query-based corpus selection and contamination triage.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl)),
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Lucene variant,
    always positive).

    Scale shape: tokens are filtered to the query terms BEFORE any
    shuffle, so only query-term postings (doc_id, term, tf) move —
    O(matching docs × |Q|) rows, never the corpus text. The corpus
    constants (N, avgdl) are a 1-row aggregate broadcast into the
    scoring join; document-frequency is an aggregate over the posting
    table itself. Everything is built-in expressions (no Python).
    """
    toks = _tokens(text_col)
    quoted = ", ".join("'" + t.replace("'", "\\'") + "'" for t in query_terms)
    base = df.select(
        F.col(id_col),
        F.expr(f"size({toks})").cast("double").alias("__dl"),
        F.expr(
            f"filter({toks}, t -> array_contains(array({quoted}), t))"
        ).alias("__qt"),
    )
    consts = base.agg(
        F.count("*").cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    tf = (
        base.select(F.col(id_col), "__dl", F.explode("__qt").alias("__term"))
        .groupBy(id_col, "__term")
        .agg(F.count("*").cast("double").alias("__tf"), F.max("__dl").alias("__dl"))
    )
    dfreq = tf.groupBy("__term").agg(F.count("*").cast("double").alias("__df"))
    idf = F.log((F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1)
    norm = F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
    contrib = idf * F.col("__tf") * (k1 + 1) / norm
    return (
        tf.join(dfreq, "__term")
        .crossJoin(F.broadcast(consts))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-token-budget chunks with overlap —
    the windowing step every training/RAG corpus build runs before
    tokenization (context-length packing's upstream sibling;
    operators/packing.py packs the chunks this emits).

    Chunk k covers tokens [k·stride, k·stride + chunk_tokens) with
    stride = chunk_tokens − overlap; the last chunk is the remainder
    (short chunks are kept — downstream filters decide). Output:
    ``(id, chunk_id, n_chunk_tokens, chunk_text, tok_start)`` with
    deterministic whitespace re-joining.

    Pure Catalyst: one token split + explode(sequence) + array slice
    per row — a narrow map whose fan-out is ceil(tokens/stride); no
    UDF, no shuffle.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = _tokens(text_col)
    n_chunks = (
        f"greatest(cast(ceil((size(__t) - {overlap}) / {stride}.0) as int), 1)"
    )
    return (
        df.select(
            F.col(id_col),
            F.expr(toks).alias("__t"),
        )
        .where(F.size("__t") > 0)
        .select(
            F.col(id_col),
            "__t",
            F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("chunk_id"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.expr(
                f"slice(__t, chunk_id * {stride} + 1, {chunk_tokens})"
            ).alias("__chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.size("__chunk").cast("bigint").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("__chunk")).alias("chunk_text"),
            (F.col("chunk_id") * F.lit(stride)).cast("bigint").alias("tok_start"),
        )
    )


def _curation_stage_flags(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document cumulative survival flags for the minimal
    curation chain — (id, __nt whitespace tokens, __norm text hash,
    __s1 presence, __s2 +word-count, __s3 +Gopher repetition,
    __s4 +exact normalized dedup). Shared by
    :func:`curation_funnel_report` (batch accounting) and
    ``streaming.stream_curation_gate`` (continuous filtering)."""
    words = f"filter(split({text_col}, '\\\\s+'), w -> w != '')"
    rep = gopher_repetition_flags(df, id_col, text_col).select(
        F.col(id_col), F.col("keep").alias("__r")
    )
    base = df.select(
        F.col(id_col),
        F.col(text_col).isNotNull().alias("__s1"),
        F.coalesce(
            F.expr(f"size({words})").cast("long"), F.lit(0)
        ).alias("__nw"),
        F.coalesce(
            F.expr(f"size({_tokens(text_col)})").cast("long"), F.lit(0)
        ).alias("__nt"),
        F.md5(F.expr(f"trim(lower({text_col}))")).alias("__norm"),
    )
    staged = base.join(rep, id_col).select(
        F.col(id_col),
        "__nt",
        "__norm",
        "__s1",
        (
            F.col("__s1") & F.col("__nw").between(50, 100000)
        ).alias("__s2"),
        (
            F.col("__s1")
            & F.col("__nw").between(50, 100000)
            & F.col("__r")
        ).alias("__s3"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__norm").orderBy(id_col)
    ranked = (
        staged.where("__s3")
        .withColumn("__rk", F.row_number().over(w))
        .select(F.col(id_col), (F.col("__rk") == 1).alias("__s4"))
    )
    return staged.join(ranked, id_col, "left").withColumn(
        "__s4", F.coalesce(F.col("__s4"), F.lit(False))
    )


def curation_funnel_report(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The filter-funnel accounting a data curator actually reads:
    run a minimal curation chain — presence, the Gopher word-count
    gate (50 <= words <= 100,000), the full Gopher REPETITION ruleset
    (:func:`gopher_repetition_flags`), then exact normalized dedup
    (keep the min-id doc per ``md5(trim(lower(text)))``) — each stage
    applied to the SURVIVORS of the previous one, and report per
    stage:

    (stage_idx, stage, docs_in, docs_out, tokens_out)

    with whitespace token counts. Four rows total: 1 text_present,
    2 word_count, 3 gopher_repetition, 4 exact_dedup. (The C4 page
    rules and the Gopher QUALITY ruleset are deliberately not in the
    default chain: both key on punctuation/stopword structure and are
    separate registered operators — compose them the same way when
    the corpus is real web text.)

    Because the first three rules are doc-local, "applied to
    survivors" is just the conjunction of keep flags — one fused
    plan, no sequential materialization. The dedup stage is the only
    cross-doc step: a row_number over the norm-hash among stage-3
    survivors.

    Scale shape: one co-keyed join on the id (the repetition
    operator's internal gram aggregation is the heavy part), one
    window over norm-hash groups (partition size = duplicate group
    size, bounded), then a single 1-row aggregate unpivoted with
    stack() — output is always exactly 4 rows.
    """
    flags = _curation_stage_flags(df, id_col, text_col)
    one = flags.agg(
        F.count("*").alias("d0"),
        *[
            F.count(F.when(F.col(f"__s{k}"), True)).alias(f"d{k}")
            for k in range(1, 5)
        ],
        *[
            F.coalesce(
                F.sum(F.when(F.col(f"__s{k}"), F.col("__nt"))), F.lit(0)
            ).alias(f"t{k}")
            for k in range(1, 5)
        ],
    )
    stages = [
        "text_present",
        "word_count",
        "gopher_repetition",
        "exact_dedup",
    ]
    cells = ", ".join(
        f"{k}, \'{stages[k - 1]}\', d{k - 1}, d{k}, t{k}"
        for k in range(1, 5)
    )
    return one.selectExpr(
        f"stack(4, {cells}) as "
        "(stage_idx, stage, docs_in, docs_out, tokens_out)"
    ).select(
        F.col("stage_idx").cast("int"),
        "stage",
        F.col("docs_in").cast("long"),
        F.col("docs_out").cast("long"),
        F.col("tokens_out").cast("long"),
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_size: int = 3,
    max_hits: int = 0,
) -> DataFrame:
    """Benchmark decontamination as a TRANSFORM: drop corpus
    documents sharing more than ``max_hits`` distinct word
    ``shingle_size``-grams with the evaluation set (the GPT-3/PaLM
    pre-training hygiene step; default ``max_hits=0`` removes any
    collision). :func:`ngram_contamination` is the report; this is
    the remediation — it returns the surviving corpus rows with their
    original columns.

    Scale shape inherits the report's: the eval side collapses to a
    broadcast DISTINCT shingle set, the corpus explodes against it
    locally, and the per-doc hit counts (contaminated docs only — a
    small fraction by construction) left-join back co-keyed on the
    id. One corpus shuffle of (id, count) pairs; the final filter is
    a narrow predicate."""
    if max_hits < 0:
        raise ValueError(f"max_hits must be >= 0: {max_hits}")
    hits = ngram_contamination(
        corpus, eval_df, id_col, text_col, shingle_size
    )
    return (
        corpus.join(hits, id_col, "left")
        .where(F.coalesce(F.col("hit_ngrams"), F.lit(0)) <= max_hits)
        .select(*corpus.columns)
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` highest tf-idf
    terms of every document. Complements :func:`bm25_scores` (query
    retrieval) with the corpus-analysis view (what is this document
    about / what should a topic sampler key on).

    ``score_micro = tf * round(ln((N+1)/(df+1)) * 1e6)`` — tf and df
    are exact integers and the idf is quantized to integer micro-nats
    (the ngram_lm convention: one libm ln per TERM, micro-rounded so
    last-ulp differences between engines vanish), making the score an
    exact integer both engines agree on. Ties break by term asc; rank
    is dense over (score desc, term asc) — a total order per doc.

    Returns (id, term, tf, score_micro, rank), rank <= k.

    Scale shape: explode terms → one partial-aggregating
    groupBy(id, term) for tf → groupBy(term) for df (both co-keyed,
    integer-only) → broadcast N (1-row) is avoided by folding N into
    the idf via a cross-joined literal-free window-less design: df
    counts are corpus-wide but the df table is vocabulary-sized —
    joined back BROADCAST when the vocabulary fits (hashed to 64-bit
    terms it usually does; for open-web scale swap to a shuffle join,
    same plan shape). The top-k per doc is a row_number window
    partitioned by doc — bounded by per-doc vocabulary."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    toks = _tokens(text_col)
    terms = df.select(
        F.col(id_col), F.explode(F.expr(toks)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.select(
        F.countDistinct(id_col).alias("__n")
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.countDistinct(id_col).alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.round(
                F.log((F.col("__n") + 1) / (F.col("__df") + 1))
                * F.lit(1_000_000)
            ).cast("long").alias("__idf_micro"),
        )
    )
    scored = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        "tf",
        (F.col("tf") * F.col("__idf_micro")).cast("long")
        .alias("score_micro"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score_micro",
                F.col("rank").cast("int"))
    )


def vocab_stats(
    df: DataFrame, group_col: str, text_col: str
) -> DataFrame:
    """Per-group vocabulary diagnostics — the corpus health numbers a
    curator compares across sources: total token count, distinct
    vocabulary size, hapax count (terms occurring exactly once: a
    high hapax fraction signals OCR noise / mojibake; a low one
    signals templated text), and the most frequent term with its
    count (mode by (count desc, term asc) — deterministic).

    Returns (group, n_tokens, vocab_size, hapax_terms, top_term,
    top_term_count), all exact integers / exact strings.

    Scale shape: explode → one partial-aggregating
    groupBy(group, term) → one groupBy(group) with max_by on a total
    order. Both shuffles are integer-or-term keyed with map-side
    combine; output is one row per group."""
    toks = _tokens(text_col)
    terms = df.select(
        F.col(group_col), F.explode(F.expr(toks)).alias("term")
    )
    counts = terms.groupBy(group_col, "term").agg(
        F.count("*").alias("__c")
    )
    return counts.groupBy(group_col).agg(
        F.sum("__c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("vocab_size"),
        F.count(F.when(F.col("__c") == 1, True)).cast("long")
        .alias("hapax_terms"),
        # mode with deterministic ties: max count, then LEAST term —
        # min_by over the (-count, term) total order
        F.min_by(
            "term",
            F.struct((-F.col("__c")).alias("nc"), F.col("term").alias("t")),
        ).alias("top_term"),
        F.max("__c").cast("long").alias("top_term_count"),
    )
