"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship Q5 "per-sample enriched network" query
(the reference's bin/GetSkinGraphs.R:55-98 pattern) on sf0.001.

`queries()` / `oracle_sql()` enumerate every implemented operator from
SURVEY.md §2 as (PySpark builder, DuckDB oracle SQL) pairs over the driver
testdata tables.  Column names/aliases match exactly between both sides;
float aggregates are rounded identically on both sides so the driver's
order-insensitive value hash is stable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hannigan_conjunctisviribus_ploscompbio_2017_spark.queries_testdata import (
    ORACLES,
    QUERIES,
    flagship,
)

SF0001 = "/root/testdata/sf0.001"

# The driver gate executes the first ~50 registered entries, so
# registration order decides what gets driver-gate credit.  r05 order
# (oldest-measurement-first — the rotation contract: every entry's
# newest green row stays within the last three measured rounds):
# (1) entries NEW this round (never driver-measured);
# (2) ALL 31 entries last driver-measured in r02 (the r04 verdict's
#     top ask — they hit the staleness limit this round);
# (3) 11 of the 47 r03-measured entries (fixture/pipeline-heavy picks
#     first; the remaining 36 rotate in r06 together with the oldest
#     r04 entries).
# All entries pass the identical local gate (tools/check_oracle.py).
# Rotation arithmetic for future rounds: 136 entries / 3-round window
# = 45 re-measures per round minimum, so the 50-cap sustains the
# contract with ~5 slots/round of headroom for NEW entries.  r06 must
# measure: the 36 r03-measured leftovers + newest additions first,
# then the oldest r04 entries.
_PRIORITY = [
    # -- (1) new in r05 --
    "ss_pq_rerank_topk",
    "pipeline_pretrain_pack_spancut",
    "gk_betweenness_stratified",
    "ss_sq8_topk",
    "dd_ingest_dedup",
    "tx_tfidf_top_terms",
    "tx_chunk_windows",
    "ev_ingest_dedup_2batch",
    # -- (2) last measured in r02 (all 31) --
    "a11_cube_rollup",
    "dd_chunk_dedup",
    "dd_contamination",
    "dd_semantic_dedup",
    "f11_substring_extract",
    "f12_json_props",
    "g13_robustness",
    "gq2_predicted_links",
    "gq4_study_network",
    "graph_build_e2e",
    "m13_rarefaction_curve_portable",
    "m4_permutation_portable",
    "pipeline_corpus_curation",
    "pipeline_pretrain_pack",
    "r6_transpose",
    "r7_column_subsample",
    "ss_embedding_health",
    "tx_bigram_backoff",
    "tx_exact_k_sample",
    "tx_line_filter",
    "tx_mixture_weights",
    "tx_pii_scrub",
    "tx_quality_filter",
    "tx_quality_score",
    "tx_repetition_stats",
    "tx_sequence_pack",
    "tx_split_assign",
    "tx_stratified_sample",
    "tx_top_ngrams",
    "tx_unigram_logprob",
    "tx_vocab_growth",
    # -- (3) oldest r03 entries (17 of 47; rest rotate in r06) --
    "pipeline_interpersonal_diversity",
    "pipeline_compare_skin",
    "pipeline_altered_diet",
    "pipeline_compare_twins",
    "gk_alpha_centrality",
    "gk_betweenness",
    "gk_betweenness_distributed",
    "gk_greedy_modularity",
    "gq3_triadic_closure",
    "gq5_sample_network",
    "ml_quality_classifier",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2: the
    never-yet-driver-measured entries and this round's additions first,
    then every remaining oracle-backed entry, then the rest."""
    oracle_names = set(ORACLES)
    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n in oracle_names})
    ordered.update(QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per queries() key (omitted for the
    non-SQL-expressible iterative/stateful/ML ops → rows-only check)."""
    return dict(ORACLES)
