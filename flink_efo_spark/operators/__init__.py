"""Relational + pipeline operators the engine adds on top of Spark.

Everything here is built from DataFrame primitives (SURVEY.md §7.3):
Catalyst plans and Tungsten executes; these helpers only encode the
*semantics* Spark lacks as a single call (as-of join, top-n,
dedup families, similarity search, text analysis).
"""

from flink_efo_spark.operators.aggregates import collect_multiset, flat_aggregate
from flink_efo_spark.operators.cep_pattern import (
    CepPattern,
    cep_pattern_select,
    stream_cep_pattern_select,
)
from flink_efo_spark.operators.iterate import (
    adamic_adar,
    average_clustering_coefficient,
    average_clustering_coefficient_directed,
    bfs_distances,
    bipartite_projection,
    community_detection,
    delta_iterate,
    edge_metrics,
    global_clustering_coefficient,
    hits,
    jaccard_index,
    label_propagation,
    local_clustering_coefficient,
    local_clustering_coefficient_directed,
    pagerank,
    sssp_distances,
    summarize_graph,
    triadic_census,
    triadic_census_directed,
    triangle_enumerate,
    vertex_metrics,
    vertex_metrics_directed,
)
from flink_efo_spark.operators.generators import (
    circulant_graph,
    complete_graph,
    cycle_graph,
    echo_graph,
    empty_graph,
    grid_graph,
    hypercube_graph,
    path_graph,
    rmat_graph,
    singleton_edge_graph,
    star_graph,
)
from flink_efo_spark.operators.graph import Graph
from flink_efo_spark.operators.iterate import (
    gather_sum_apply,
    pagerank_warm,
    scatter_gather,
    triangle_listing,
    vertex_centric,
)
from flink_efo_spark.operators.joins import asof_join, interval_join
from flink_efo_spark.operators.lookup import (
    dim_snapshot_client,
    lookup_join,
    lookup_join_async,
    lookup_join_batched,
)
from flink_efo_spark.operators.multimodal import (
    decode_image,
    frame_sample,
    media_metadata,
)
from flink_efo_spark.operators.sampling import (
    mixture_sample,
    token_budget_sample,
)
from flink_efo_spark.operators.topn import top_n
from flink_efo_spark.operators.dedup import (
    dedup_exact,
    dedup_incremental_near,
    dedup_keep_first,
    dedup_keep_last,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
    simhash_signatures,
)
from flink_efo_spark.operators.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from flink_efo_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    quality_stats,
    token_stats,
)

__all__ = [
    "CepPattern",
    "Graph",
    "circulant_graph",
    "complete_graph",
    "cycle_graph",
    "echo_graph",
    "empty_graph",
    "gather_sum_apply",
    "grid_graph",
    "hypercube_graph",
    "pagerank_warm",
    "path_graph",
    "rmat_graph",
    "scatter_gather",
    "singleton_edge_graph",
    "star_graph",
    "triangle_listing",
    "vertex_centric",
    "cep_pattern_select",
    "stream_cep_pattern_select",
    "asof_join",
    "interval_join",
    "top_n",
    "collect_multiset",
    "flat_aggregate",
    "lookup_join",
    "lookup_join_async",
    "lookup_join_batched",
    "dim_snapshot_client",
    "delta_iterate",
    "bfs_distances",
    "pagerank",
    "label_propagation",
    "sssp_distances",
    "triangle_enumerate",
    "jaccard_index",
    "adamic_adar",
    "hits",
    "community_detection",
    "summarize_graph",
    "local_clustering_coefficient",
    "global_clustering_coefficient",
    "average_clustering_coefficient",
    "triadic_census",
    "triadic_census_directed",
    "bipartite_projection",
    "vertex_metrics",
    "local_clustering_coefficient_directed",
    "average_clustering_coefficient_directed",
    "vertex_metrics_directed",
    "edge_metrics",
    "decode_image",
    "frame_sample",
    "media_metadata",
    "dedup_exact",
    "dedup_incremental_near",
    "mixture_sample",
    "token_budget_sample",
    "dedup_keep_first",
    "dedup_keep_last",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash_near_duplicates",
    "simhash_signatures",
    "cosine_topk",
    "ivf_cosine_topk",
    "lsh_cosine_topk",
    "doc_fingerprint",
    "lang_id",
    "quality_stats",
    "token_stats",
]
