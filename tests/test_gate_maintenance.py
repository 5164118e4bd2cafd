"""Admission-gate store maintenance (r07 verdict ask #3): the append
step between runs, one two-RUN test per gate family — a clone of a
run-1 admit must be flagged duplicate in run 2 — plus the plan guard
that deriving the appended rows never reads (so never shuffles) the
existing store."""

from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import gate_maintenance as GM
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.dedup import (
    fingerprint_store,
    ingest_dedup,
    minhash_ingest_dedup,
    minhash_store,
)
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.similarity import (
    sampled_centroids,
    semantic_ingest_dedup,
    semantic_store,
)
from tests.test_plan_shapes import plan_of

TEXT_A = "the quick brown fox jumps over the lazy dog again and again"
TEXT_B = "completely different content about adaptive query execution plans"
TEXT_C = "a third body of text that is not like the other two at all"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_gate_two_run_append(spark, tmp_path):
    """Run 1 admits TEXT_B; append_admitted_fingerprints persists it;
    run 2's clone of TEXT_B under a new id must flag dup_store — and
    would have been 'new' without the append (asserted, so the test
    can only pass through the maintenance step)."""
    store_path = str(tmp_path / "fp_store")
    fingerprint_store(_docs(spark, [(100, TEXT_A)])).write.parquet(store_path)

    run1 = _docs(spark, [(1, TEXT_B), (2, TEXT_A)])
    dec1 = ingest_dedup(run1, spark.read.parquet(store_path))
    d1 = {r.id: r.status for r in dec1.collect()}
    assert d1 == {1: "new", 2: "dup_store"}

    run2 = _docs(spark, [(3, TEXT_B), (4, TEXT_C)])
    # control: without the append the clone is 'new' again
    pre = {r.id: r.status for r in ingest_dedup(run2, spark.read.parquet(store_path)).collect()}
    assert pre[3] == "new"

    GM.append_admitted_fingerprints(dec1, store_path)
    dec2 = {r.id: r.status for r in ingest_dedup(run2, spark.read.parquet(store_path)).collect()}
    assert dec2 == {3: "dup_store", 4: "new"}
    # the store grew by exactly the run-1 admits (doc 1's fingerprint)
    assert spark.read.parquet(store_path).count() == 2


def test_minhash_gate_two_run_append_flat(spark, tmp_path):
    """Near-dup family, flat store layout: run 2's clone of the run-1
    admit must collide in the appended buckets and report the run-1
    doc as its match."""
    store_path = str(tmp_path / "mh_store")
    minhash_store(_docs(spark, [(100, TEXT_A)])).write.parquet(store_path)

    run1 = _docs(spark, [(1, TEXT_B)])
    dec1 = minhash_ingest_dedup(run1, spark.read.parquet(store_path))
    assert {r.id: r.status for r in dec1.collect()} == {1: "new"}

    GM.append_admitted_minhash(dec1, run1, store_path)
    run2 = _docs(spark, [(2, TEXT_B), (3, TEXT_A)])
    rows = {
        r.id: r
        for r in minhash_ingest_dedup(run2, spark.read.parquet(store_path)).collect()
    }
    assert rows[2].status == "dup_near" and rows[2].match_id == 1
    assert rows[2].est_jaccard == 1.0
    assert rows[3].status == "dup_near" and rows[3].match_id == 100


def test_minhash_gate_two_run_append_array_layout(spark, tmp_path):
    """The band-array bucket layout (bucket_by_hash=False — the
    documented partitionBy trap): initial store and append both use
    derive_minhash_partition's `_part` column and partitionBy("band",
    "_part"); the probe side still matches on the raw (band, bucket)
    array, so a clone of the run-1 admit flags dup_near."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.dedup import (
        portable_token_hash,
    )

    kw = dict(hash_fn=portable_token_hash, bucket_by_hash=False)
    store_path = str(tmp_path / "mh_store_arr")
    GM.derive_minhash_partition(
        minhash_store(_docs(spark, [(100, TEXT_A)]), **kw), hash_partitions=4
    ).write.partitionBy("band", "_part").parquet(store_path)

    run1 = _docs(spark, [(1, TEXT_B)])
    dec1 = minhash_ingest_dedup(run1, spark.read.parquet(store_path), **kw)
    assert {r.id: r.status for r in dec1.collect()} == {1: "new"}

    GM.append_admitted_minhash(
        dec1, run1, store_path,
        partition_by=("band", "_part"), hash_partitions=4, **kw,
    )
    store = spark.read.parquet(store_path)
    # one layout under one root: every row carries the derived _part
    assert "_part" in store.columns and store.filter(F.col("_part").isNull()).count() == 0
    rows = {r.id: r for r in minhash_ingest_dedup(_docs(spark, [(2, TEXT_B)]), store, **kw).collect()}
    assert rows[2].status == "dup_near" and rows[2].match_id == 1


def test_semantic_gate_two_run_append_keeps_dpp(spark, tmp_path):
    """Semantic family: the append lands inside the cell-partitioned
    layout, so run 2 sees the run-1 admit as dup_semantic AND the
    store scan stays dynamic-partition-pruned after the append (the
    layout property the partitionBy("cell") append exists to keep)."""
    dim = 4
    base = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.1]), (101, [0.0, 1.0, 0.0, 0.1]),
         (102, [0.0, 0.0, 1.0, 0.1])],
        "vec_id long, embedding array<double>",
    )
    cents = sampled_centroids(base, n_cells=3)
    store_path = str(tmp_path / "sem_store")
    semantic_store(base, dim=dim, n_cells=3, centroids=cents).write.partitionBy(
        "cell"
    ).parquet(store_path)

    run1 = spark.createDataFrame(
        [(1, [0.7, 0.7, 0.0, 0.1])], "vec_id long, embedding array<double>"
    )
    dec1 = semantic_ingest_dedup(
        run1, spark.read.parquet(store_path), cents, dim, tau=0.95, n_probe=1
    )
    assert {r.id: r.status for r in dec1.collect()} == {1: "new"}

    GM.append_admitted_semantic(dec1, run1, store_path, cents, dim)
    run2 = spark.createDataFrame(
        [(2, [0.7, 0.7, 0.0, 0.1])], "vec_id long, embedding array<double>"
    )
    gate2 = semantic_ingest_dedup(
        run2, spark.read.parquet(store_path), cents, dim, tau=0.95, n_probe=1
    )
    plan = plan_of(gate2)
    assert "dynamicpruning" in plan.lower()  # append kept the DPP layout
    rows = {r.id: r for r in gate2.collect()}
    assert rows[2].status == "dup_semantic" and rows[2].match_id == 1
    assert rows[2].cosine == 1.0


def test_append_derivation_never_reads_store(spark, tmp_path):
    """Plan guard: the frames the append writes are derived from the
    decisions + source delta ONLY — the existing store path never
    appears in their plans (so the append cannot shuffle or rewrite
    it), and the admitted-id probe is a broadcast semi join, never a
    sort-merge."""
    store_path = str(tmp_path / "guard_store")
    minhash_store(_docs(spark, [(100, TEXT_A)])).write.parquet(store_path)
    run1 = _docs(spark, [(1, TEXT_B)])
    dec1 = minhash_ingest_dedup(run1, spark.read.parquet(store_path)).localCheckpoint()

    mh_rows = GM.admitted_minhash_rows(dec1, run1)
    plan = plan_of(mh_rows)
    assert "guard_store" not in plan
    assert "BroadcastHashJoin LeftSemi" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan

    fp_rows = GM.admitted_fingerprints(dec1.withColumn("fingerprint", F.lit("x")))
    assert "guard_store" not in plan_of(fp_rows)

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    dec_sem = spark.createDataFrame([(1, "new")], "id long, status string")
    sem_rows = GM.admitted_semantic_rows(dec_sem, emb, [[1.0, 0.0, 0.0, 0.0]], dim=4)
    sem_plan = plan_of(sem_rows)
    assert "guard_store" not in sem_plan
    assert "BroadcastHashJoin LeftSemi" in sem_plan
    assert "SortMergeJoin" not in sem_plan
