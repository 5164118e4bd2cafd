"""CLIENT-SIDE statistics helpers (SURVEY §2 M3/M5/M6).

Everything in this package runs on the DRIVER over collected (small)
results — ordination and hypothesis tests the reference performs in R
after its Neo4j/igraph stages (vegan::metaMDS, wilcox.test, kruskalmc,
anosim, betadisper). The engine-side contract is: reduce at scale with
Spark (Bray-Curtis long-form distances, per-sample aggregates), collect
the small output, finish here. None of these helpers touch a
SparkSession except `collect_distance_matrix`, which is the explicit
scale boundary (S samples → S×S driver matrix).
"""

from hannigan_conjunctisviribus_ploscompbio_2017_spark.client.stats import (
    anosim,
    betadisper,
    chi2_sf,
    collect_distance_matrix,
    kruskal_wallis,
    kruskalmc,
    mann_whitney_u,
    nmds,
    normal_sf,
    pairwise_wilcox,
    pcoa,
    wilcoxon_signed_rank,
)

__all__ = [
    "anosim",
    "betadisper",
    "chi2_sf",
    "collect_distance_matrix",
    "kruskal_wallis",
    "kruskalmc",
    "mann_whitney_u",
    "nmds",
    "normal_sf",
    "pairwise_wilcox",
    "pcoa",
    "wilcoxon_signed_rank",
]
