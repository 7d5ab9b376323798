"""Hybrid retrieval: reciprocal-rank fusion of scored candidate lists.

Beyond-reference LLM-pipeline operator (the engine's BM25 + ANN
scorers feed it): RRF (Cormack et al., SIGIR'09) merges ranked lists
from incomparable scorers — lexical BM25 and embedding cosine being
the canonical pair in RAG / training-data query-selection stacks —
without score calibration::

    rrf(d) = Σ_lists 1 / (k + rank_list(d))

Scale design (100 TB): RRF operates on CANDIDATE lists (each scorer's
top-N), never the corpus — the inputs are bounded by N per scorer, so
the global rank window here sorts thousands of rows, not the corpus
(Spark plans the pre-rank ``top`` cap as TakeOrdered). The expensive
parts — BM25 postings and ANN search — stay in their own operators
(operators/text.py bm25_scores: query-term postings only;
operators/similarity.py ivf/lsh top-k: bucketed candidates), which
scale independently. Fusion itself is one union + one small hash
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    lists: list[tuple[DataFrame, str, str]],
    k: int = 60,
    top: int | None = None,
    id_out: str = "doc_id",
) -> DataFrame:
    """Fuse scored lists into ``(id_out, n_lists, rrf_score)``.

    ``lists``: (df, id_col, score_col) triples; each list is ranked
    by score DESCENDING with the id as deterministic tie-break (round
    scores upstream if they come from float math — rank boundaries
    must be engine-stable). ``top`` caps each list before fusion (the
    standard RRF cut); ``k`` is the usual dampening constant (60 in
    the original paper).
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one scored list")
    parts = []
    for df, id_col, score_col in lists:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        ranked = df.select(
            F.col(id_col).alias(id_out),
            F.row_number().over(w).alias("__rank"),
        )
        if top is not None:
            ranked = ranked.where(F.col("__rank") <= top)
        parts.append(
            ranked.select(
                id_out, (1.0 / (k + F.col("__rank"))).alias("__rrf")
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy(id_out).agg(
        F.count("*").alias("n_lists"),
        F.round(F.sum("__rrf"), 8).alias("rrf_score"),
    )
