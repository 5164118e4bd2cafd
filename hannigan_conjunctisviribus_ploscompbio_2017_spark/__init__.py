"""PySpark-native analytics engine with the query/data-processing
capabilities of SchlossLab/Hannigan_ConjunctisViribus_ploscompbio_2017.

The reference is a Neo4j-2.3 property graph (phage/bacteria bipartite
interaction network + sample/patient/study metadata) driven by Perl REST
loaders and R analytics (plyr/dplyr + igraph + vegan + caret).  This package
re-expresses the whole capability surface Spark-first:

- ``sources``    — typed readers for the reference's interchange formats
                   (headerless TSV, CSV, FASTA, FASTQ, SAM, GenBank, pilerCR,
                   EMBL .dat), parquet checkpoints (SURVEY §2.1).
- ``functions``  — scalar function surface (key sanitize, genus/species
                   extraction, composite keys, length normalization, edge
                   weights; SURVEY §2.7) + text-analysis fns.
- ``operators``  — relational ops (§2.2-2.8), graph build (§2.9), graph
                   kernels (§2.10), resampling stats (§2.11), plus the
                   training-data-pipeline ops (dedup, similarity search,
                   multimodal, text analysis).
- ``plans``      — the canonical pattern-query suite Q1-Q7 (§2.9) as
                   parameterized DataFrame builders / SQL views.
- ``ml``         — MLlib random-forest interaction model mirroring
                   bin/CalculatePredModel.R semantics.
- ``streaming``  — Structured Streaming ingest of the events table
                   (incremental edge ingest path the reference lacks).

Design rules (100 TB first):
- DataFrame/SQL only; no RDDs. Catalyst does pushdown/pruning/reorder.
- Broadcast small dims explicitly; AQE on for skew.
- Python only in Arrow-batched pandas UDFs, never row-at-a-time, never on
  the hot path when a built-in exists.
- No ``collect()`` inside operators; per-sample graph kernels are grouped
  aggregations / joint power iterations over ALL samples at once, not
  driver-side loops.
"""

from hannigan_conjunctisviribus_ploscompbio_2017_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
