"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship KG-construction pipeline at sf0.001.
queries()      — every implemented operator/query, keyed per SURVEY.md §2.
oracle_sql()   — DuckDB-equivalent SQL for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcript turns → JSON-LD docs → RDF triples (sf0.001)."""
    from jsonld_ex_spark.operators.kg_pipeline import kg_triples

    return kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jsonld_ex_spark.operators import kg_queries
    from jsonld_ex_spark.operators.kg_pipeline import kg_triples

    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # KG-construction pipeline (SURVEY.md §2.1: expand/flatten/toRdf
        # fused stage; §2.2 scans/joins/aggregations/windows)
        "kg_transcripts": kg_queries.kg_transcripts,
        "kg_turn_order": kg_queries.kg_turn_order,
        "kg_mentions": kg_queries.kg_mentions,
        "kg_entity_links": kg_queries.kg_entity_links,
        "kg_triples": kg_triples,
        "kg_triple_stats": kg_queries.kg_triple_stats,
        "kg_nquads_roundtrip_stats": kg_queries.kg_nquads_roundtrip_stats,
        "kg_triple_stats_snapshot": kg_queries.kg_triple_stats_snapshot,
        "kg_frame_tool_turns": kg_queries.kg_frame_tool_turns,
        "kg_graph_dedup": kg_queries.kg_graph_dedup,
        "kg_roundtrip_check": kg_queries.kg_roundtrip_check,
        # Graph-pattern queries over the constructed KG (operators/bgp.py)
        "kg_bgp_tool_mentions": kg_queries.kg_bgp_tool_mentions,
        "kg_bgp_bridge_entities": kg_queries.kg_bgp_bridge_entities,
        "kg_bgp_turn_tools": kg_queries.kg_bgp_turn_tools,
        "kg_bgp_nontool_mentions": kg_queries.kg_bgp_nontool_mentions,
        "kg_bgp_persisted_tool_mentions": kg_queries.kg_bgp_persisted_tool_mentions,
        "kg_bgp_human_or_assistant_turns": kg_queries.kg_bgp_human_or_assistant_turns,
        "kg_bgp_entity_mention_stats": kg_queries.kg_bgp_entity_mention_stats,
        "kg_bgp_ask": kg_queries.kg_bgp_ask,
        "kg_bgp_filtered_mentions": kg_queries.kg_bgp_filtered_mentions,
        # round-6 textual SPARQL front-end: the SAME query string is
        # parsed for the Spark plan and for the oracle SQL
        "kg_sparql_text_mentions": kg_queries.kg_sparql_text_mentions,
        "kg_sparql_text_entity_stats": kg_queries.kg_sparql_text_entity_stats,
        "kg_sparql_text_path_edges": kg_queries.kg_sparql_text_path_edges,
        "kg_sparql_text_optional_tools": kg_queries.kg_sparql_text_optional_tools,
        "kg_sparql_text_union_stats": kg_queries.kg_sparql_text_union_stats,
        "kg_path_conv_turns": kg_queries.kg_path_conv_turns,
        "kg_bgp_top_entities": kg_queries.kg_bgp_top_entities,
        "kg_path_tool_turns": kg_queries.kg_path_tool_turns,
        "kg_bgp_values_mentions": kg_queries.kg_bgp_values_mentions,
        # round-5 SPARQL-surface completions: path-bound FILTER +
        # NOT EXISTS, persisted-table property paths, BIND projection
        "kg_path_filtered_nontool_turns": kg_queries.kg_path_filtered_nontool_turns,
        "kg_path_persisted_tool_turns": kg_queries.kg_path_persisted_tool_turns,
        "kg_bgp_bind_mention_labels": kg_queries.kg_bgp_bind_mention_labels,
        "kg_bgp_entity_idx_sum": kg_queries.kg_bgp_entity_idx_sum,
        "kg_bgp_avg_idx_having": kg_queries.kg_bgp_avg_idx_having,
        "kg_describe_convs": kg_queries.kg_describe_convs,
        "kg_update_tool_redaction": kg_queries.kg_update_tool_redaction,
        "kg_update_typed_delete": kg_queries.kg_update_typed_delete,
        "kg_bgp_turn_entity_lists": kg_queries.kg_bgp_turn_entity_lists,
        # round-6 SPARQL-surface completions: aggregation subqueries +
        # DISTINCT/OFFSET paging (the expression-library query
        # kg_bgp_expr_doc_labels registers via jsonld_ops.queries())
        "kg_bgp_subquery_hot_entities": kg_queries.kg_bgp_subquery_hot_entities,
        "kg_bgp_expr_turn_keys": kg_queries.kg_bgp_expr_turn_keys,
        "kg_bgp_page_entities": kg_queries.kg_bgp_page_entities,
        # Distributed rdf:first/rest list walk (pointer doubling)
        "kg_list_walk": kg_queries.kg_list_walk,
        "kg_construct_entity_edges": kg_queries.kg_construct_entity_edges,
        "kg_conversation_text": kg_queries.kg_conversation_text,
        "kg_entity_pagerank": kg_queries.kg_entity_pagerank,
        "kg_entity_triangles": kg_queries.kg_entity_triangles,
        "kg_entity_neighbor_similarity": kg_queries.kg_entity_neighbor_similarity,
        "kg_entity_components": kg_queries.kg_entity_components,
        "kg_shape_report": kg_queries.kg_shape_report,
        # Incremental maintenance: snapshot-to-snapshot triple delta
        "kg_triples_delta": kg_queries.kg_triples_delta,
        "kg_triples_delta_snapshot": kg_queries.kg_triples_delta_snapshot,
    }
    from jsonld_ex_spark.operators import entity_linking, jsonld_ops
    from jsonld_ex_spark.streaming import stream_pipeline

    q.update(entity_linking.queries())
    q.update(jsonld_ops.queries())
    q.update(stream_pipeline.queries())
    try:
        from jsonld_ex_spark.functions import (
            ann_ops,
            corpus_ops,
            dedup_ops,
            multimodal_ops,
            relational_ops,
            sketch_ops,
            skew_ops,
            text_ops,
        )

        q.update(text_ops.queries())
        q.update(skew_ops.queries())
        q.update(sketch_ops.queries())
        q.update(dedup_ops.queries())
        q.update(ann_ops.queries())
        q.update(relational_ops.queries())
        q.update(multimodal_ops.queries())
        q.update(corpus_ops.queries())
    except ImportError:
        pass
    return q


def oracle_sql() -> dict[str, str]:
    from jsonld_ex_spark.plans import oracles

    o = {
        "kg_transcripts": oracles.transcripts_oracle(),
        "kg_turn_order": oracles.kg_turn_order_oracle(),
        "kg_mentions": oracles.kg_mentions_oracle(),
        "kg_entity_links": oracles.kg_entity_links_oracle(),
        "kg_triples": oracles.kg_triples_oracle(),
        "kg_triple_stats": oracles.kg_triple_stats_oracle(),
        # the N-Quads write→read round trip must reproduce the exact
        # same per-predicate stats as the in-memory triples
        "kg_nquads_roundtrip_stats": oracles.kg_triple_stats_oracle(),
        # two snapshot-table commits must compose to the same stats
        "kg_triple_stats_snapshot": oracles.kg_triple_stats_oracle(),
        "kg_frame_tool_turns": oracles.kg_frame_tool_turns_oracle(),
        "kg_graph_dedup": oracles.kg_graph_dedup_oracle(),
        "kg_roundtrip_check": oracles.kg_roundtrip_check_oracle(),
        "kg_link_scores": oracles.kg_link_scores_oracle(),
        "kg_entity_cooccurrence": oracles.kg_entity_cooccurrence_oracle(),
        "kg_bgp_tool_mentions": oracles.kg_bgp_tool_mentions_oracle(),
        "kg_bgp_bridge_entities": oracles.kg_bgp_bridge_entities_oracle(),
        "kg_bgp_turn_tools": oracles.kg_bgp_turn_tools_oracle(),
        "kg_bgp_nontool_mentions": oracles.kg_bgp_nontool_mentions_oracle(),
        # the persisted-table BGP must reproduce the in-memory BGP oracle
        "kg_bgp_persisted_tool_mentions": oracles.kg_bgp_tool_mentions_oracle(),
        "kg_bgp_human_or_assistant_turns": oracles.kg_bgp_human_or_assistant_turns_oracle(),
        "kg_bgp_entity_mention_stats": oracles.kg_bgp_entity_mention_stats_oracle(),
        "kg_bgp_ask": oracles.kg_bgp_ask_oracle(),
        "kg_bgp_filtered_mentions": oracles.kg_bgp_filtered_mentions_oracle(),
        "kg_sparql_text_mentions": oracles.kg_sparql_text_mentions_oracle(),
        "kg_sparql_text_entity_stats": oracles.kg_sparql_text_entity_stats_oracle(),
        "kg_sparql_text_path_edges": oracles.kg_sparql_text_path_edges_oracle(),
        "kg_sparql_text_optional_tools": oracles.kg_sparql_text_optional_tools_oracle(),
        "kg_sparql_text_union_stats": oracles.kg_sparql_text_union_stats_oracle(),
        "kg_path_conv_turns": oracles.kg_path_conv_turns_oracle(),
        "kg_bgp_top_entities": oracles.kg_bgp_top_entities_oracle(),
        "kg_path_tool_turns": oracles.kg_path_tool_turns_oracle(),
        "kg_bgp_values_mentions": oracles.kg_bgp_values_mentions_oracle(),
        "kg_path_filtered_nontool_turns": oracles.kg_path_filtered_nontool_turns_oracle(),
        # the persisted-table path query must reproduce the in-memory
        # path+pattern oracle
        "kg_path_persisted_tool_turns": oracles.kg_path_tool_turns_oracle(),
        "kg_bgp_bind_mention_labels": oracles.kg_bgp_bind_mention_labels_oracle(),
        "kg_bgp_entity_idx_sum": oracles.kg_bgp_entity_idx_sum_oracle(),
        "kg_bgp_avg_idx_having": oracles.kg_bgp_avg_idx_having_oracle(),
        "kg_describe_convs": oracles.kg_describe_convs_oracle(),
        "kg_update_tool_redaction": oracles.kg_update_tool_redaction_oracle(),
        "kg_update_typed_delete": oracles.kg_update_typed_delete_oracle(),
        "kg_bgp_turn_entity_lists": oracles.kg_bgp_turn_entity_lists_oracle(),
        "kg_bgp_subquery_hot_entities": oracles.kg_bgp_subquery_hot_entities_oracle(),
        "kg_bgp_expr_turn_keys": oracles.kg_bgp_expr_turn_keys_oracle(),
        "kg_bgp_page_entities": oracles.kg_bgp_page_entities_oracle(),
        "kg_list_walk": oracles.kg_list_walk_oracle(),
        "kg_construct_entity_edges": oracles.kg_construct_entity_edges_oracle(),
        "kg_conversation_text": oracles.kg_conversation_text_oracle(),
        "kg_entity_pagerank": oracles.kg_entity_pagerank_oracle(),
        "kg_entity_triangles": oracles.kg_entity_triangles_oracle(),
        "kg_entity_neighbor_similarity": oracles.kg_entity_neighbor_similarity_oracle(),
        "kg_entity_components": oracles.kg_entity_components_oracle(),
        "kg_shape_report": oracles.kg_shape_report_oracle(),
        "kg_triples_delta": oracles.kg_triples_delta_oracle(),
        # the snapshot-table diff must reproduce the in-memory delta
        "kg_triples_delta_snapshot": oracles.kg_triples_delta_oracle(),
    }
    from jsonld_ex_spark.operators import jsonld_ops
    from jsonld_ex_spark.streaming import stream_pipeline

    o.update(jsonld_ops.oracle_sql())
    o.update(stream_pipeline.oracle_sql())
    try:
        from jsonld_ex_spark.functions import (
            ann_ops,
            corpus_ops,
            dedup_ops,
            multimodal_ops,
            relational_ops,
            sketch_ops,
            skew_ops,
            text_ops,
        )

        o.update(text_ops.oracle_sql())
        o.update(skew_ops.oracle_sql())
        o.update(sketch_ops.oracle_sql())
        o.update(dedup_ops.oracle_sql())
        o.update(ann_ops.oracle_sql())
        o.update(relational_ops.oracle_sql())
        o.update(multimodal_ops.oracle_sql())
        o.update(corpus_ops.oracle_sql())
    except ImportError:
        pass
    return o
