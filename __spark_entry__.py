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
# registration order decides what gets driver-gate credit.  r06 order
# (oldest-measurement-first — the rotation contract: every entry's
# newest green row stays within the last three measured rounds):
# (1) entries NEW this round (never driver-measured);
# (2) ALL 36 entries last driver-measured in r03 (they hit the
#     staleness limit this round — the r05 verdict's ask #2);
# (3) oldest r04-measured entries backfilling the remaining 10 slots
#     (fixture/ML/kernel-heavy picks first), smoothing r07's load:
#     after r06 the r04 cohort shrinks to 40 — next round's mandatory
#     set (incl. gb_gene_network, gk_eccentricity_closeness,
#     gk_connected_components, gk_connectivity), which fits the 50-cap
#     with ~10 slots for r07 additions and r05 pre-rotation.
# All entries pass the identical local gate (tools/check_oracle.py).
# Rotation arithmetic for future rounds: 140 entries / 3-round window
# = 47 re-measures per round minimum, so the 50-cap sustains the
# contract with ~3 slots/round of steady-state headroom.  SUSTAINABILITY
# CEILING: at 150 entries the contract consumes the whole 50-cap — any
# growth past ~146 should retire a redundant entry per addition (e.g.
# fold near-duplicate shapes into their strongest representative).
# r07 must measure: the 40 r04-measured leftovers + newest additions
# first, then the oldest r05 entries.
_PRIORITY = [
    # -- (1) new in r06 --
    "ss_ivf_sq8_topk",
    "ss_semantic_ingest",
    "ev_semantic_ingest_2batch",
    "dd_minhash_ingest",
    # -- (2) last measured in r03 (all 36) --
    "a12_row_votes",
    "a1_pricing_summary",
    "a2_mean_score_per_pair",
    "a3_min_score_per_pair",
    "a4_degree_count",
    "a5_count_distinct",
    "a7_rarefaction_depth",
    "a9_best_hit_dedup",
    "ev_chunk_first_seen",
    "ev_first_seen_dedup",
    "ev_near_dup_stream",
    "ev_stream_pack",
    "f_scalar_chain",
    "gq1_interaction_scores",
    "j11_asof_join",
    "j1_equi_join",
    "j2_broadcast_annotate",
    "j3_feature_merge",
    "j7_cross_join",
    "m13_rarefaction_curve",
    "m1_rarefaction",
    "m4_permutation_test",
    "ml_roc_portable",
    "mm_video_frames",
    "o1_distinct_sorted",
    "o4_union_all",
    "o5_intersect",
    "o6_except",
    "p3_p4_predicate_filters",
    "p6_any_positive",
    "p7_length_range",
    "p8_anti_filter",
    "p9_semi_filter",
    "r1_pivot_matrix",
    "r4_melt",
    "w1_top_per_group",
    # -- (3) oldest r04 entries backfilling to the 50-cap --
    "ml_rf_interactions",
    "ml_nested_cv",
    "ml_roc_points",
    "m1_rarefaction_portable",
    "m2_bray_curtis",
    "gk_eigenvector_centrality",
    "gk_katz_centrality",
    "gk_pagerank",
    "gk_communities_modularity",
    "gk_diameter_radius",
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
