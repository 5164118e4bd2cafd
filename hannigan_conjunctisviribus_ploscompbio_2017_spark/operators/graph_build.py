"""Property-graph build (SURVEY §2.9) — the reference's Perl REST loaders
re-expressed as one declarative merge.

The reference loads the graph through millions of per-row HTTP round trips
(bin/BenchmarkDatabaseCreation.pl:103-175 in /root/reference): per input
line, ≥2 label-index lookups, conditional node creates, an O(degree)
outgoing-relationship scan, then an edge create-or-update.  Here the whole
build is: node union + dropDuplicates, one full-outer join cascade for the
Infects feature columns, anti-join + union for predicted edges, plain
unions for metadata edges, join-and-coalesce for property updates.  One
shuffle stage per step; at 100 TB the edge table partitions on (src, dst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import feature_merge

# Column order for the canonical edges table (schemas.EDGES).
EDGE_COLS = [
    "src",
    "dst",
    "type",
    "interaction",
    "crispr",
    "blast",
    "blastx",
    "pfam",
    "prediction",
    "abundance",
]

NODE_ATTRS = [
    "genus",
    "species",
    "length",
    "platform",
    "mda",
    "body_location",
    "purification",
    "location",
    "host",
]


def _conform_edges(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    out = df
    for c in EDGE_COLS:
        if c not in cols:
            out = out.withColumn(c, F.lit(None))
    return out.select(
        F.col("src").cast("string"),
        F.col("dst").cast("string"),
        F.col("type").cast("string"),
        F.col("interaction").cast("int"),
        F.col("crispr").cast("double"),
        F.col("blast").cast("double"),
        F.col("blastx").cast("double"),
        F.col("pfam").cast("double"),
        F.col("prediction").cast("string"),
        F.col("abundance").cast("long"),
    )


def build_nodes(parts: list[DataFrame], assert_unique: bool = True) -> DataFrame:
    """Node upsert with name-dedup (bin/BenchmarkDatabaseCreation.pl:103-143).

    Each input carries (id, label, name, [attrs]). Later parts may enrich
    earlier nodes; dedup keeps the FIRST part's occurrence per (label, id)
    — create-if-absent semantics — pinned explicitly by part index
    (dropDuplicates alone would keep an arbitrary row per key).
    """
    from pyspark.sql import Window as W

    out: DataFrame | None = None
    for i, p in enumerate(parts):
        cols = set(p.columns)
        cur = p
        for c in NODE_ATTRS:
            if c not in cols:
                cur = cur.withColumn(c, F.lit(None))
        cur = cur.select("id", "label", "name", *NODE_ATTRS).withColumn(
            "_part", F.lit(i)
        )
        out = cur if out is None else out.unionByName(cur)
    assert out is not None
    w = W.partitionBy("label", "id").orderBy("_part")
    deduped = (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_part")
    )
    if assert_unique:
        # die-on-duplicate semantics (bin/AddPredictedRelationships.pl:57-58):
        # same id under two labels is a modeling error.
        dupes = deduped.groupBy("id").count().filter(F.col("count") > 1)
        if dupes.limit(1).count() > 0:
            raise ValueError("duplicate node ids across labels: " + str(dupes.take(5)))
    return deduped


def build_infects_edges(
    interactions: DataFrame | None,
    score_tables: dict[str, DataFrame],
) -> DataFrame:
    """Infects-edge feature merge (bin/BenchmarkDatabaseCreation.pl:147-175).

    ≤1 edge per (phage, bacterium); each score file contributes one
    property, merged via full-outer join (update-or-create). Inputs carry
    (src, dst, score) — already collapsed to one row per pair (A2 mean
    upstream, bin/CollapseGeneScores.R:38).

    Score keys accept any casing (the reference's own property names are
    CRISPR/BLAST/BLASTX/PFAM) but MUST name a known score column —
    unknown keys used to be silently case-folded into all-null columns
    by the schema conformer, building an edge table with no scores and
    no error.
    """
    known = {"crispr", "blast", "blastx", "pfam"}
    folded = {k.lower(): v for k, v in score_tables.items()}
    if len(folded) != len(score_tables) or not set(folded) <= known:
        raise ValueError(
            f"score_tables keys {sorted(score_tables)} must map 1:1 onto "
            f"the Infects score columns {sorted(known)} (case-insensitive)"
        )
    merged = feature_merge(folded, keys=["src", "dst"], value_col="score", fill=None)
    if interactions is not None:
        inter = interactions.select("src", "dst", F.col("interaction").cast("int"))
        merged = merged.join(inter, ["src", "dst"], "full_outer")
    return _conform_edges(merged.withColumn("type", F.lit("Infects")))


def add_predicted_edges(edges: DataFrame, predictions: DataFrame) -> DataFrame:
    """PredictedInteraction edges, skip-if-exists
    (bin/AddPredictedRelationships.pl:63-92): anti-join against existing
    (src, dst, type) then union."""
    pred = _conform_edges(
        predictions.select("src", "dst", "prediction").withColumn(
            "type", F.lit("PredictedInteraction")
        )
    )
    existing = edges.filter(F.col("type") == "PredictedInteraction").select("src", "dst")
    new = pred.join(existing, ["src", "dst"], "left_anti")
    return edges.unionByName(new)


def add_metadata_edges(edges: DataFrame, meta_edges: DataFrame) -> DataFrame:
    """Sampled/Diseased/IncludedInStudy/TimePoint/IncludedForPatient edges
    (bin/Metadata2graph.pl:45-207). Input carries (src, dst, type
    [, abundance])."""
    return edges.unionByName(_conform_edges(meta_edges))


def update_node_lengths(nodes: DataFrame, lengths: DataFrame) -> DataFrame:
    """Length property join-update; unknown ids are skipped (reported by
    caller if desired) — bin/length2graph.pl:42-59."""
    ln = lengths.select(F.col("id"), F.col("length").alias("_new_len"))
    return (
        nodes.join(F.broadcast(ln), "id", "left")
        .withColumn("length", F.coalesce(F.col("_new_len"), F.col("length")))
        .drop("_new_len")
    )


def simplify(edges: DataFrame) -> DataFrame:
    """G12 — drop self-loops and multi-edges (igraph::simplify,
    bin/TriadicClosures.R:45).

    The survivor among multi-edges is DETERMINISTIC: min over the
    remaining columns (struct ordering) per (src, dst, type) —
    dropDuplicates keeps whichever row a shuffle ordered first, so
    repeated builds could keep different abundance/property values.
    Edges with a NULL endpoint are dropped (src != dst is NULL-false);
    that is intentional — a property-graph edge without both endpoints
    is malformed — and now documented rather than accidental."""
    keys = ["src", "dst", "type"]
    others = [c for c in edges.columns if c not in keys]
    clean = edges.filter(F.col("src") != F.col("dst"))
    if not others:
        return clean.dropDuplicates(keys)
    agg = clean.groupBy(*keys).agg(F.min(F.struct(*others)).alias("_rest"))
    return agg.select(*keys, *[F.col(f"_rest.{c}").alias(c) for c in others])


# --------------------------------------------------------------------------
# gene/protein network variant (bin/ProteinNetworkCreation.pl)
# --------------------------------------------------------------------------

GENE_NODE_COLS = ["id", "label", "name", "cluster_id", "accession", "data_type"]


def sanitize_name(col) -> F.Column:
    """Identifier normalization from the reference loaders: runs of
    non-alphanumeric characters → '_', trailing '_' stripped
    (bin/ProteinNetworkCreation.pl:70,112-119 — the Perl applies the
    trailing strip on the .dat matching path; normalizing both sides here
    makes node names and record names join-stable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.regexp_replace(c, "[^A-Za-z0-9]+", "_"), "_+$", "")


def build_gene_nodes(
    phage_genes: DataFrame, bacteria_genes: DataFrame, assert_unique: bool = True
) -> DataFrame:
    """ReferenceGenes node build (bin/ProteinNetworkCreation.pl:59-95):
    each input carries (unique_id, cluster_id, accession, name); output is
    the typed node table (id, label Phage|Bacteria, name sanitized,
    cluster_id, accession, data_type='ReferenceGenes').

    Create-if-absent per id (phage part wins over bacteria, mirroring the
    reference's load order) pinned by part index; die-on-duplicate ids
    (the Perl dies on >1 node per UniqueID label). Same shuffle shape as
    build_nodes: one window dedup over the union."""
    from pyspark.sql import Window as W

    def _conform(df: DataFrame, label: str, part: int) -> DataFrame:
        return df.select(
            F.col("unique_id").cast("string").alias("id"),
            F.lit(label).alias("label"),
            sanitize_name("name").alias("name"),
            F.col("cluster_id").cast("string").alias("cluster_id"),
            F.col("accession").cast("string").alias("accession"),
            F.lit("ReferenceGenes").alias("data_type"),
            F.lit(part).alias("_part"),
        )

    both = _conform(phage_genes, "Phage", 0).unionByName(
        _conform(bacteria_genes, "Bacteria", 1)
    )
    w = W.partitionBy("label", "id").orderBy("_part")
    deduped = (
        both.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_part")
    )
    if assert_unique:
        dupes = deduped.groupBy("id").count().filter(F.col("count") > 1)
        if dupes.limit(1).count() > 0:
            raise ValueError("duplicate gene node ids across labels: " + str(dupes.take(5)))
    return deduped


def linked_gene_edges(gene_nodes: DataFrame, records: DataFrame) -> DataFrame:
    """LinkedGenes edge build (bin/ProteinNetworkCreation.pl:99-131):
    per flat-file record (record_id, organism, host) — e.g. the
    sources.embl_records output — connect EVERY Phage gene node named by
    the sanitized organism to EVERY Bacteria gene node named by the
    sanitized host, with Literature='TRUE'.

    The reference's nested REST loops become two name-equality joins; the
    per-record all-pairs fan-out is exactly the join product. Records
    with no matching nodes on either side drop out (inner joins), like
    the Perl's empty get_nodes_by_label arrays. Multi-edges across
    records are preserved (relate_to creates one per call) — pipe
    through simplify() for the deduped view."""
    recs = records.select(
        F.col("record_id").cast("string"),
        sanitize_name("organism").alias("_org"),
        sanitize_name("host").alias("_host"),
    )
    phage = gene_nodes.filter(F.col("label") == "Phage").select(
        F.col("id").alias("src"), F.col("name").alias("_org")
    )
    bact = gene_nodes.filter(F.col("label") == "Bacteria").select(
        F.col("id").alias("dst"), F.col("name").alias("_host")
    )
    return (
        recs.join(phage, "_org")
        .join(bact, "_host")
        .select(
            "src",
            "dst",
            F.lit("LinkedGenes").alias("type"),
            F.lit("TRUE").alias("literature"),
            "record_id",
        )
    )
