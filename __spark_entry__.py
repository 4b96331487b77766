"""Driver contract for the spark-graft builder (PySpark target).

queries() exposes every driver-checkable operator from SURVEY.md §2 plus
the training-data pipeline operators (dedup / similarity / text analysis)
over the driver's testdata tables; oracle_sql() holds the exact DuckDB
equivalents.  The indexed build/serve engine itself (posting blocks,
block-max pruning, resume) is exercised by `python -m pytest -x -q` and
bench.py — its result values are cross-checked here through the
decelled-style declarative fulltext queries (same pinned tokenizer+BM25).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oscar_spark.operators import (dedup, multimodal, pipeline, relational,
                                   similarity, textstats)
from oscar_spark.operators import fulltext_sql as fts

SF1 = "/root/testdata/sf0.001"

BM25_AND_TERMS = ["data", "spark"]
BM25_OR_TERMS = ["vector", "stream"]
SET_A, SET_B = "window", "batch"
# full-grammar facet query: (term OR phrase) MINUS prefix, AND fielded —
# exercises the parsed-query → result-set → kvstats composition
# (Worker::kvstats over a completion's CQR) through the driver oracle
FACET_QUERY = '(data + "order scan") - qu* lang:en'


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 AND query over sf0.001 documents."""
    return fts.bm25_topk(spark, SF1, BM25_AND_TERMS, k=10, require_all=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- fulltext (SURVEY §2.4 A1, §2.5 O1/O4, §2.6 set ops, §3.2) ---
        "fts_term_df": fts.term_df,
        "fts_doc_stats": fts.doc_stats,
        "fts_bm25_and": lambda s, d: fts.bm25_topk(
            s, d, BM25_AND_TERMS, k=10, require_all=True),
        "fts_bm25_or": lambda s, d: fts.bm25_topk(
            s, d, BM25_OR_TERMS, k=10, require_all=False),
        "fts_set_and": lambda s, d: fts.set_op(s, d, SET_A, SET_B, "and"),
        "fts_set_or": lambda s, d: fts.set_op(s, d, SET_A, SET_B, "or"),
        "fts_set_not": lambda s, d: fts.set_op(s, d, SET_A, SET_B, "not"),
        "fts_set_xor": lambda s, d: fts.set_op(s, d, SET_A, SET_B, "xor"),
        "fts_prefix": lambda s, d: fts.prefix_search(s, d, "qu"),
        # true phrase semantics (QT_EXACT analog): tokens adjacent in
        # the indexed stream, not AND-of-tokens
        "fts_phrase": lambda s, d: fts.phrase_topk(
            s, d, ["order", "scan"], k=10),
        # fielded composite token (`lang:en`, TextSearchTraits.h:108)
        "fts_fielded": lambda s, d: fts.fielded_topk(
            s, d, ["data"], "lang", "en", k=10),
        "fts_facet_stats": lambda s, d: fts.facet_stats(s, d, "data"),
        "fts_facet_entropy": lambda s, d: fts.facet_entropy(s, d, "data"),
        # shannonKvstats exclusion-set parity (Workfunctions.cpp:171-233)
        "fts_facet_entropy_excl": lambda s, d: fts.facet_entropy(
            s, d, "data", exclude_keys=("source",),
            exclude_values=("lang=en",)),
        # facets over a PARSED query's result set (set ops + phrase +
        # prefix + fielded leaves), not just a single term
        "fts_facet_results": lambda s, d: fts.facet_stats_query(
            s, d, FACET_QUERY),
        "fts_facet_entropy_results": lambda s, d: fts.facet_entropy_query(
            s, d, FACET_QUERY, exclude_values=("lang=en",)),
        # --- dedup suite ---
        "dedup_exact": dedup.exact_duplicates,
        "dedup_minhash_sigs": dedup.minhash_signatures,
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs,
        "dedup_ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(
            s, d, threshold=0.8),
        "dedup_simhash": dedup.simhash,
        # production-width 64-bit simhash as two 32-bit halves (BIGINT-
        # safe in both engines) + banded hamming-distance near-dup pairs
        "dedup_simhash64": dedup.simhash64,
        "dedup_simhash64_pairs": dedup.simhash64_pairs,
        "dedup_components": dedup.dedup_components,
        # full curation pipeline: lang filter + quality filter +
        # near-dup canonicalization in one declarative plan
        "pipeline_clean_corpus": lambda s, d: pipeline.clean_corpus(
            s, d, min_quality=0.55),
        # --- similarity search ---
        "sim_cosine_topk": lambda s, d: similarity.cosine_topk(s, d, 0, 10),
        "sim_ann_lsh": lambda s, d: similarity.ann_lsh_topk(s, d, 0, 10),
        "sim_label_centroids": similarity.label_centroids,
        # IVF scale path: deterministic sampled-centroid coarse
        # quantizer + nprobe search.  stride pinned to IVF_STRIDE so
        # the DuckDB oracle replicates the exact centroid set; the
        # library default (stride=None) auto-sizes k ≈ √n
        "sim_ivf_assign": lambda s, d: similarity.ivf_assign(
            s, d, stride=similarity.IVF_STRIDE),
        "sim_ivf_topk": lambda s, d: similarity.ivf_topk(
            s, d, 0, 10, nprobe=4, stride=similarity.IVF_STRIDE),
        # two-level (hierarchical) coarse quantizer — the 10^12-vector
        # rung where even √n centroids exceed broadcast limits
        "sim_ivf2_assign": lambda s, d: similarity.ivf2_assign(
            s, d, stride=similarity.IVF_STRIDE,
            stride0=similarity.IVF2_STRIDE0),
        "sim_ivf2_topk": lambda s, d: similarity.ivf2_topk(
            s, d, 0, 10, nprobe=4, w0=2, stride=similarity.IVF_STRIDE,
            stride0=similarity.IVF2_STRIDE0),
        # banded LSH (2 bands × 32 buckets); n_planes pinned so the
        # DuckDB oracle agrees — production path auto-scales via
        # similarity.auto_planes
        "dedup_embed_cosine": lambda s, d: similarity.cosine_near_dup_pairs(
            s, d, threshold=0.35, n_planes=5, n_bands=2),
        # --- multimodal plumbing (binary payload → features; stubbed
        # decode is a deterministic fake, so it still gets a full value
        # oracle) ---
        "mm_features": multimodal.media_features_q,
        "mm_frame_sample": multimodal.frame_sample_q,
        # --- text analysis ---
        "text_lang_id": textstats.lang_id,
        "text_quality": textstats.quality_score,
        "text_token_counts": textstats.token_counts,
        "text_fingerprints": textstats.fingerprints,
        "text_lang_dist": textstats.lang_distribution,
        "text_source_topk": lambda s, d: textstats.source_topk(s, d, 5),
        # --- relational inventory (SURVEY §2.1-2.6 on TPC-H-ish tables) ---
        "rel_scan_minmax": relational.scan_minmax,
        "rel_filtered_projection": relational.filtered_projection,
        "rel_pricing_summary": relational.pricing_summary,
        "rel_score_max": relational.score_max,
        "rel_revenue_by_nation": relational.revenue_by_nation,
        "rel_orders_customer_join": relational.orders_customer_join,
        "rel_ranked_parts": lambda s, d: relational.ranked_parts(s, d, 100),
        "rel_top_revenue_orders": lambda s, d: relational.top_revenue_orders(
            s, d, 20),
        "rel_customer_set_ops": relational.customer_set_ops,
        "rel_order_stats": relational.order_stats,
        "rel_events_hourly": relational.events_hourly,
        "rel_sessionize": lambda s, d: relational.sessionize(s, d, 30),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "fts_term_df": fts.TERM_DF_SQL,
        "fts_doc_stats": fts.DOC_STATS_SQL,
        "fts_bm25_and": fts.bm25_topk_sql(BM25_AND_TERMS, 10, True),
        "fts_bm25_or": fts.bm25_topk_sql(BM25_OR_TERMS, 10, False),
        "fts_set_and": fts.set_op_sql(SET_A, SET_B, "and"),
        "fts_set_or": fts.set_op_sql(SET_A, SET_B, "or"),
        "fts_set_not": fts.set_op_sql(SET_A, SET_B, "not"),
        "fts_set_xor": fts.set_op_sql(SET_A, SET_B, "xor"),
        "fts_prefix": fts.prefix_search_sql("qu"),
        "fts_phrase": fts.phrase_topk_sql(["order", "scan"], 10),
        "fts_fielded": fts.fielded_topk_sql(["data"], "lang", "en", 10),
        "fts_facet_stats": fts.facet_stats_sql("data"),
        "fts_facet_entropy": fts.facet_entropy_sql("data"),
        "fts_facet_entropy_excl": fts.facet_entropy_sql(
            "data", exclude_keys=("source",), exclude_values=("lang=en",)),
        "fts_facet_results": fts.facet_stats_query_sql(FACET_QUERY),
        "fts_facet_entropy_results": fts.facet_entropy_query_sql(
            FACET_QUERY, exclude_values=("lang=en",)),
        "dedup_exact": dedup.EXACT_DUP_SQL,
        "dedup_minhash_sigs": dedup.MINHASH_SQL,
        "dedup_minhash_lsh": dedup.minhash_lsh_sql(),
        "dedup_ngram_jaccard": dedup.ngram_jaccard_sql(0.8),
        "dedup_simhash": dedup.simhash_sql(),
        "dedup_simhash64": dedup.simhash64_sql(),
        "dedup_simhash64_pairs": dedup.simhash64_pairs_sql(),
        "dedup_components": dedup.dedup_components_sql(),
        "pipeline_clean_corpus": pipeline.clean_corpus_sql(0.55),
        "sim_cosine_topk": similarity.cosine_topk_sql(0, 10),
        "sim_ann_lsh": similarity.ann_lsh_topk_sql(0, 10),
        "sim_label_centroids": similarity.LABEL_CENTROIDS_SQL,
        "sim_ivf_assign": similarity.ivf_assign_sql(),
        "sim_ivf_topk": similarity.ivf_topk_sql(0, 10, 4),
        "sim_ivf2_assign": similarity.ivf2_assign_sql(),
        "sim_ivf2_topk": similarity.ivf2_topk_sql(0, 10, 4, 2),
        "dedup_embed_cosine": similarity.cosine_near_dup_pairs_sql(
            0.35, n_planes=5, n_bands=2),
        "mm_features": multimodal.MEDIA_FEATURES_SQL,
        "mm_frame_sample": multimodal.FRAME_SAMPLE_SQL,
        "text_lang_id": textstats.LANG_ID_SQL,
        "text_quality": textstats.QUALITY_SQL,
        "text_token_counts": textstats.TOKEN_COUNTS_SQL,
        "text_fingerprints": textstats.FINGERPRINTS_SQL,
        "text_lang_dist": textstats.LANG_DIST_SQL,
        "text_source_topk": textstats.source_topk_sql(5),
        "rel_scan_minmax": relational.SCAN_MINMAX_SQL,
        "rel_filtered_projection": relational.FILTERED_PROJECTION_SQL,
        "rel_pricing_summary": relational.PRICING_SUMMARY_SQL,
        "rel_score_max": relational.SCORE_MAX_SQL,
        "rel_revenue_by_nation": relational.REVENUE_BY_NATION_SQL,
        "rel_orders_customer_join": relational.ORDERS_CUSTOMER_JOIN_SQL,
        "rel_ranked_parts": relational.ranked_parts_sql(100),
        "rel_top_revenue_orders": relational.top_revenue_orders_sql(20),
        "rel_customer_set_ops": relational.CUSTOMER_SET_OPS_SQL,
        "rel_order_stats": relational.ORDER_STATS_SQL,
        "rel_events_hourly": relational.EVENTS_HOURLY_SQL,
        "rel_sessionize": relational.sessionize_sql(30),
    }
