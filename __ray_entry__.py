"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init`` / ``ray.shutdown`` happens in here or in ``llama_ray``.

``queries()`` covers the operator inventory of SURVEY.md §2 as
link-graph / analytics pipelines over the testdata tables;
``oracle_sql()`` mirrors each (minus the genuinely non-SQL ones,
which tests check against numpy oracles instead).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: derive the link graph from the sf0.001
    tables, run 10 PageRank supersteps, return per-vertex ranks."""
    from llama_ray.pipelines import queries as q

    return q.q_pagerank("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from llama_ray.pipelines import queries as q

    return {
        "edge_list": q.q_edge_list,
        "edge_kind_counts": q.q_edge_kind_counts,
        "out_degrees": q.q_out_degrees,
        "degree_distribution": q.q_degree_distribution,
        "edge_prop_stats": q.q_edge_prop_stats,
        "pagerank": q.q_pagerank,
        "pagerank_top10": q.q_pagerank_top10,
        "pagerank_weighted": q.q_pagerank_weighted,
        "katz": q.q_katz,
        "louvain": q.q_louvain,
        "louvain_modularity": q.q_louvain_modularity,
        "louvain_weighted": q.q_louvain_weighted,
        "louvain_multilevel": q.q_louvain_multilevel,
        "dag_layers": q.q_dag_layers,
        "wcc": q.q_wcc,
        "core_numbers": q.q_core_numbers,
        "scc": q.q_scc,
        "label_propagation": q.q_label_propagation,
        "triangle_count": q.q_triangle_count,
        "bfs": q.q_bfs,
        "sssp_weighted": q.q_sssp_weighted,
        "avg_nbr_balance": q.q_avg_nbr_balance,
        "ppr": q.q_ppr,
        "wcc_sizes": q.q_wcc_sizes,
        "top_referenced": q.q_top_referenced,
        "bc_random": q.q_bc_random,
        "events_sessions": q.q_events_sessions,
        "events_props_sum": q.q_events_props_sum,
        "doc_fingerprints": q.q_doc_fingerprints,
        "knn_lsh": q.q_knn_lsh,
        "knn_ivf": q.q_knn_ivf,
        "doc_exact_dedup": q.q_doc_exact_dedup,
        "doc_minhash_clusters": q.q_doc_minhash_clusters,
        "doc_ngram_jaccard": q.q_doc_ngram_jaccard,
        "doc_simhash": q.q_doc_simhash,
        "doc_language_id": q.q_doc_language_id,
        "doc_quality": q.q_doc_quality,
        "embedding_near_dup": q.q_embedding_near_dup,
        "embedding_cos_pairs": q.q_embedding_cos_pairs,
        "doc_token_stats": q.q_doc_token_stats,
        "lang_stats": q.q_lang_stats,
        "events_hourly": q.q_events_hourly,
        "knn_cosine": q.q_knn_cosine,
        "vec_seed_partition": q.q_vec_seed_partition,
        "vec_kmeans": q.q_vec_kmeans,
        "graph_walks": q.q_graph_walks,
        "neighbor_sample": q.q_neighbor_sample,
        "graph_walks_weighted": q.q_graph_walks_weighted,
        "feature_prop": q.q_feature_prop,
        "mis": q.q_mis,
        "hyperanf_registers": q.q_hyperanf,
        "edge_support": q.q_edge_support,
        "hits": q.q_hits,
        "local_clustering": q.q_local_clustering,
        "ktruss": q.q_ktruss,
        "assortativity": q.q_assortativity,
        "reciprocity": q.q_reciprocity,
        "lp_modularity": q.q_lp_modularity,
        "coloring": q.q_coloring,
        "link_prediction": q.q_link_prediction,
        "vocab_topk": q.q_vocab_topk,
        "doc_split": q.q_doc_split,
        "pseudo_diameter": q.q_pseudo_diameter,
        "max_matching": q.q_max_matching,
        "closeness": q.q_closeness,
        "events_funnel": q.q_events_funnel,
        "label_centroid_norms": q.q_label_centroid_norms,
        "dup_stats_by_source": q.q_dup_stats_by_source,
        "top_users_by_value": q.q_top_users_by_value,
        "doc_len_quantiles": q.q_doc_len_quantiles,
        "events_value_quantiles": q.q_events_value_quantiles,
        "tfidf_topk": q.q_tfidf_topk,
        "bigram_topk": q.q_bigram_topk,
        "seq_pack": q.q_seq_pack,
        "contamination": q.q_contamination,
        "doc_repetition": q.q_doc_repetition,
        "doc_dup_spans": q.q_doc_dup_spans,
        "doc_fluency": q.q_doc_fluency,
        "doc_scrub": q.q_doc_scrub,
        "corpus_pipeline": q.q_corpus_pipeline,
        "source_cap": q.q_source_cap,
        "lang_mix": q.q_lang_mix,
        "events_retention": q.q_events_retention,
        "events_user_hll": q.q_events_user_hll,
    }


def oracle_sql() -> dict[str, str]:
    from llama_ray.data_ops.text import SCRUB_DEMO_PATTERNS
    from llama_ray.pipelines import oracles as o

    return {
        "edge_list": o.edge_list_sql(),
        "edge_kind_counts": o.edge_kind_counts_sql(),
        "out_degrees": o.out_degrees_sql(),
        "degree_distribution": o.degree_distribution_sql(),
        "edge_prop_stats": o.edge_prop_stats_sql(),
        "pagerank": o.pagerank_sql(),
        "pagerank_top10": o.pagerank_top10_sql(),
        "pagerank_weighted": o.pagerank_weighted_sql(),
        "katz": o.katz_sql(),
        "louvain": o.louvain_sql(),
        "louvain_modularity": o.louvain_modularity_sql(),
        "louvain_weighted": o.louvain_weighted_sql(),
        "louvain_multilevel": o.louvain_multilevel_sql(),
        "dag_layers": o.dag_layers_sql(),
        "wcc": o.wcc_sql(),
        "core_numbers": o.core_numbers_sql(),
        "label_propagation": o.label_propagation_sql(),
        "triangle_count": o.triangle_count_sql(),
        "bfs": o.bfs_sql(),
        "sssp_weighted": o.sssp_weighted_sql(),
        "graph_walks": o.graph_walks_sql(),
        "neighbor_sample": o.neighbor_sample_sql(),
        "graph_walks_weighted": o.graph_walks_weighted_sql(),
        "feature_prop": o.feature_prop_sql(),
        "mis": o.mis_sql(),
        "hyperanf_registers": o.hyperanf_sql(),
        "edge_support": o.edge_support_sql(),
        "hits": o.hits_sql(),
        "local_clustering": o.local_clustering_sql(),
        "ktruss": o.ktruss_sql(),
        "assortativity": o.assortativity_sql(),
        "reciprocity": o.reciprocity_sql(),
        "lp_modularity": o.lp_modularity_sql(),
        "coloring": o.coloring_sql(),
        "link_prediction": o.link_prediction_sql(),
        "vocab_topk": o.vocab_topk_sql(),
        "doc_split": o.doc_split_sql(),
        "pseudo_diameter": o.pseudo_diameter_sql(),
        "max_matching": o.matching_sql(),
        "closeness": o.closeness_sql(),
        "events_funnel": o.events_funnel_sql(),
        "label_centroid_norms": o.label_centroid_norms_sql(),
        "dup_stats_by_source": o.dup_stats_by_source_sql(),
        "top_users_by_value": o.top_users_by_value_sql(),
        "doc_len_quantiles": o.doc_len_quantiles_sql(),
        "events_value_quantiles": o.events_value_quantiles_sql(),
        "tfidf_topk": o.tfidf_topk_sql(),
        "bigram_topk": o.bigram_topk_sql(),
        # knn_ivf is the single rows-only query left: its spherical
        # k-means centroids depend on Ray's block layout (per-block
        # float partial sums), which SQL cannot replicate bit-exactly;
        # recall/exactness are pytest-verified instead
        "bc_random": o.bc_random_sql(),
        "scc": o.scc_sql(),
        "doc_language_id": o.doc_language_id_sql(),
        "doc_simhash": o.doc_simhash_sql(),
        "doc_fingerprints": o.doc_fingerprints_sql(),
        "doc_ngram_jaccard": o.doc_ngram_jaccard_sql(),
        "doc_minhash_clusters": o.doc_minhash_clusters_sql(),
        "embedding_near_dup": o.embedding_near_dup_sql(),
        "knn_lsh": o.knn_lsh_sql(),
        "doc_quality": o.doc_quality_sql(),
        "embedding_cos_pairs": o.embedding_cos_pairs_sql(),
        "avg_nbr_balance": o.avg_nbr_balance_sql(),
        "ppr": o.ppr_sql(),
        "wcc_sizes": o.wcc_sizes_sql(),
        "top_referenced": o.top_referenced_sql(),
        "events_sessions": o.events_sessions_sql(),
        "events_props_sum": o.events_props_sum_sql(),
        "doc_exact_dedup": o.doc_exact_dedup_sql(),
        "doc_token_stats": o.doc_token_stats_sql(),
        "lang_stats": o.lang_stats_sql(),
        "events_hourly": o.events_hourly_sql(),
        "knn_cosine": o.knn_cosine_sql(),
        "vec_seed_partition": o.seed_partition_sql(),
        "vec_kmeans": o.kmeans_quantized_sql(),
        "seq_pack": o.seq_pack_sql(),
        "contamination": o.contamination_sql(),
        "doc_repetition": o.doc_repetition_sql(),
        "doc_dup_spans": o.duplicate_spans_sql(),
        "doc_fluency": o.token_fluency_sql(),
        "doc_scrub": o.scrub_sql(SCRUB_DEMO_PATTERNS),
        "corpus_pipeline": o.corpus_pipeline_sql(SCRUB_DEMO_PATTERNS),
        "source_cap": o.source_cap_sql(),
        "lang_mix": o.lang_mix_sql(),
        "events_retention": o.events_retention_sql(),
        "events_user_hll": o.events_user_hll_sql(),
    }
