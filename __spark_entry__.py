"""Driver contract for the spark-graft builder (PySpark target).

Everything is derived from the query registry
(``sensql_presto_spark.queries.registry``): each registered QuerySpec
supplies both the Spark builder for ``queries()`` and, when deterministic
and SQL-expressible, the DuckDB oracle for ``oracle_sql()``.

Priority window
---------------
Round 1's correctness gate only sampled the first 50 query names
(alphabetical cut at ``fn_url``), leaving every TPC-H / window / setop /
unnest / sensql / similarity / text / multimodal query without a
driver-checked row.  Per the round-1 verdict's remediation list, this file
therefore publishes a curated *priority block*: one representative of every
SURVEY.md §2 family (plus every query fixed this round) is aliased with an
``a{NN}_`` prefix so it sorts — and is inserted — ahead of everything else.
The canonical entries remain registered under their original names, so a
driver that checks the full registry simply sees both spellings of the
priority queries.  ``a07_tpch_q01`` is the same spec as ``tpch_q01``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sensql_presto_spark.queries import all_specs

# ROUND-12 ROTATION (r11 window was 50/50 green — everything rotated
# out, cumulative union 386/386).  The composition is exactly the
# window r11 PRE-ANNOUNCED here and in COVERAGE.md's rotation table,
# and the staleness gate (tools/ledger.py, STALE_ROUNDS=6) dictates
# block (1): at r12 start the 36 r4-era entries below are the only
# stale debt (the ledger names this exact set and exits nonzero if any
# is missing); the remaining 14 slots go to the r5-era rows with the
# weakest indirect coverage, minus one slot per r12-added operator.
# Three blocks:
#  (1) the 36 r4-era stale entries (r11 VERDICT next-round #1 names
#      this exact set — the 35 from the r11 block-2 deferral rationale
#      + source_jdbc_roundtrip).
#  (2) 13 of the 50 r5-era rows — picked for WEAK indirect coverage:
#      seven r4-added operators that no bench, fuzz mode, or value-
#      level pytest exercises (mutation_sql_dml, events_cdc_apply,
#      events_retention_cohorts, events_transition_matrix,
#      mm_image_resize, scale_file_compaction, text_train_val_split —
#      events_cdc_apply and text_train_val_split have plan pins only),
#      plus the six TPC-DS bodies whose SQL shapes are unique in the
#      suite and value-checked nowhere else: tpcds_q14/q14b (the only
#      INTERSECT-driven cross-channel bodies), tpcds_q23/q23b
#      (max-over-subquery + frequent-item HAVING), tpcds_q04 (3-channel
#      year-over-year CTE self-join, superset of q11's shape),
#      tpcds_q39 (the only stddev/coefficient-of-variation body).
#      The 37 r5-era rows deferred to r13 are the covered ones:
#      tpch_q15-q20+q22 (benched EVERY round, value-compared to the
#      oracle in every bench run); dedup_bloom_prefilter and
#      text_dedup_paragraph (benched every round + plan pins);
#      ddl_access_control (300-seed model-differential access fuzz in
#      tests/test_access_fuzz.py compares the full observable surface
#      every round); tpcds_q03 (benched every round); the remaining 26
#      TPC-DS bodies (q02, q05, q06, q08, q09, q10, q11, q12, q13,
#      q15-q22, q24/q24b, q25, q26, q27, q29, q30, q39b, q40) —
#      pure-SQL bodies over the same scan/join/agg/window machinery as
#      the 8 TPC-DS rows re-greened in r11 (q31-q38) and the 6 TPC-DS
#      rows in THIS window (q39b's body is q39 with the second CASE
#      filter, value-checked here via q39), with 22 TPC-H value-benched
#      alongside; tpcds_q11 (year-over-year 2-channel self-join — the
#      strongest-covered of the original 14 picks because block-2's q04
#      value-checks the identical shape with a third channel) is the
#      row DISPLACED by the r12-added operator.
#  (3) operators ADDED in r12 (pre-verified --vanilla EXACT at sf0.01
#      AND sf0.1 at commit time): source_kafka_avro_multibranch closes
#      the last record-decoder residue (r11 VERDICT What's-missing #1 /
#      next-round #3) — general multi-branch avro unions decoded by
#      writer branch index with per-branch type dispatch
#      (AvroColumnDecoder.java:160-216 value-driven serializeValue
#      semantics: surface the value when the column's SQL type matches
#      the branch, SQL NULL for a null branch, loud error on mismatch).
#  PRE-ANNOUNCED r13 WINDOW: the 37 r5-era entries deferred above
#  (tpch_q15/q16/q17/q18/q19/q20/q22, dedup_bloom_prefilter,
#  text_dedup_paragraph, ddl_access_control, tpcds_q02/q03/q05/q06/
#  q08/q09/q10/q11/q12/q13/q15/q16/q17/q18/q19/q20/q21/q22/q24/q24b/
#  q25/q26/q27/q29/q30/q39b/q40) + 13 of the 50 r6-era rows picked
#  for weakest indirect coverage, minus one slot per r13-added operator
#  (displacing the strongest-covered r6 rows first).
PRIORITY: tuple[str, ...] = (
    # (1) r4-era stale (36)
    "cluster_kmeans",
    "ddl_alter_table",
    "ddl_create_function",
    "ddl_create_type",
    "ddl_logical_view",
    "dedup_incremental",
    "dedup_semantic",
    "dedup_url",
    "events_funnel",
    "fn_hash_presto_ports",
    "fn_hash_spark_native",
    "fn_presto_compat2",
    "fn_presto_compat3",
    "graph_pagerank",
    "mm_image_decode",
    "mm_video_frames",
    "pipeline_end_to_end",
    "quantified_any",
    "recursive_cte_hierarchy",
    "scale_distributed_sort",
    "scale_dpp_join",
    "sensql_knn_federated",
    "setop_except",
    "setop_intersect",
    "setop_union_distinct",
    "sim_decontaminate",
    "sim_mmr_rerank",
    "source_jdbc_roundtrip",
    "text_chunk_overlap",
    "text_decontaminate",
    "text_fingerprint",
    "text_sequence_pack",
    "text_substring_removal",
    "text_token_stats",
    "text_trigram_logprob",
    "tpch_q14",
    # (2) r5-era, weakest indirect coverage (13)
    "events_cdc_apply",
    "events_retention_cohorts",
    "events_transition_matrix",
    "mm_image_resize",
    "mutation_sql_dml",
    "scale_file_compaction",
    "text_train_val_split",
    "tpcds_q04",
    "tpcds_q14",
    "tpcds_q14b",
    "tpcds_q23",
    "tpcds_q23b",
    "tpcds_q39",
    # (3) r12-added operators
    "source_kafka_avro_multibranch",
)


def _alias(i: int, name: str) -> str:
    return f"a{i:02d}_{name}"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from sensql_presto_spark.queries import get

    return get("tpch_q01").build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Priority-block aliases first (both in insertion order and in
    alphabetical order), then the full canonical registry.
    """
    specs = all_specs()
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for i, name in enumerate(PRIORITY):
        out[_alias(i, name)] = specs[name].build
    for name, spec in sorted(specs.items()):
        out[name] = spec.build
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every deterministic query."""
    specs = all_specs()
    out: dict[str, str] = {}
    for i, name in enumerate(PRIORITY):
        if specs[name].oracle is not None:
            out[_alias(i, name)] = specs[name].oracle
    for name, spec in sorted(specs.items()):
        if spec.oracle is not None:
            out[name] = spec.oracle
    return out
