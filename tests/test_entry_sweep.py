"""Execute every driver-facing queries() entry against the real testdata.

The driver's correctness gate runs each query at sf0.01 against the real
parquet files; locally most operators are tested on synthetic fixtures
whose schemas can drift from the testdata's (e.g. parquet TIMESTAMP_NTZ vs
an in-memory TIMESTAMP fixture). This sweep catches any analysis-time or
runtime failure against the actual tables before the driver does.

Runs at sf0.001 (smoke scale) and skips only the deliberately expensive
iterative entries, which have their own fixture tests.
"""

import pytest

from tests.conftest import SF0001

from __spark_entry__ import entry, oracle_sql, queries

# Iterative / ML entries that take minutes even at smoke scale; each has a
# dedicated fixture test (test_kernels.py / test_ml.py / test_stats.py /
# test_pipelines.py).
SLOW = {
    "ml_rf_interactions",
    "ml_nested_cv",
    "ml_roc_points",
    "pipeline_interpersonal_diversity",
    "pipeline_compare_skin",
    "pipeline_altered_diet",
    "pipeline_compare_twins",
}

ALL = sorted(queries())


@pytest.mark.parametrize("name", [n for n in ALL if n not in SLOW])
def test_query_runs_on_testdata(spark, name):
    df = queries()[name](spark, SF0001)
    # count() executes the full plan; every query must run and have a schema
    assert df.columns, f"{name}: empty schema"
    df.count()


def test_entry_runs(spark):
    df = entry(spark)
    assert df.columns
    assert df.count() >= 0


def test_oracle_keys_subset_of_queries():
    qs, orc = set(queries()), set(oracle_sql())
    assert orc <= qs, f"oracles without queries: {sorted(orc - qs)}"


def test_bench_labels_frozen():
    """BENCH_r{N}.json history is keyed by q-labels: a label that has
    appeared in any recorded round must keep its query name forever
    (append with fresh labels, never renumber). Pins the full r01/r02
    map; extend this dict when adding q17+."""
    from bench import HEADLINE

    frozen = {
        "q1": "a1_pricing_summary",
        "q2": "gq5_sample_network",
        "q3": "j3_feature_merge",
        "q4": "gq3_triadic_closure",
        "q5": "m2_bray_curtis",
        "q6": "g10_node_entropy",
        "q7": "ev_sessionize",
        "q8": "dd_minhash_lsh",
        "q9": "ss_cosine_topk",
        "q10": "w1_top_per_group",
        "q11": "gq4_study_network",
        "q12": "m1_rarefaction_portable",
        "q13": "dd_chunk_dedup",
        "q14": "dd_contamination",
        "q15": "tx_unigram_logprob",
        "q16": "tx_sequence_pack",
        "q17": "ss_ivf_topk",
        "q18": "ss_srp_lsh_topk",
        "q19": "ss_pq_topk",
        "q20": "ss_ivf_pq_topk",
        "q21": "tx_tfidf_top_terms",
        "q22": "ss_semantic_ingest",
        "q23": "m1_rarefaction",
    }
    got = dict(HEADLINE)
    labels = [label for label, _ in HEADLINE]
    assert len(labels) == len(set(labels)), "duplicate bench labels"
    for label, name in frozen.items():
        assert got.get(label) == name, (
            f"{label} re-keyed: history says {name}, bench.py says {got.get(label)}"
        )
    # every headline name must be a registered query
    assert set(got.values()) <= set(queries())


def test_semantic_gate_family_equivalence(spark):
    """r10 retirement adjudication (ev_semantic_ingest_2batch → the
    surviving ev_semantic_ingest_foreach, the m13/m4 precedent): the
    two streaming semantic gates verified against the IDENTICAL oracle
    SQL — the stateful applyInPandasWithState twin (retired builder,
    kept unregistered) and the corpus-scale foreachBatch twin (keeps
    the driver row) — must produce row-for-row identical decisions on
    the same two-batch feed.  This pins the family equivalence the
    retirement relies on; if the operators ever diverge, the retired
    family loses its coverage-by-proxy and this fails."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.queries_testdata import (
        QUERIES,
        ev_semantic_ingest_2batch,
    )

    assert "ev_semantic_ingest_2batch" not in QUERIES  # really retired
    a = ev_semantic_ingest_2batch(spark, SF0001)
    b = QUERIES["ev_semantic_ingest_foreach"](spark, SF0001)
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    stateful = sorted(map(tuple, a.select(*cols).collect()))
    foreach = sorted(map(tuple, b.select(*cols).collect()))
    assert stateful == foreach and len(stateful) == 20


def test_store_layout_family_equivalence(spark):
    """r12 retirement adjudication (dd_ingest_store_append → the
    surviving dd_ingest_versioned_store, the ev_semantic_ingest_2batch
    precedent): the two store-append lifecycles verify against the
    IDENTICAL oracle SQL (`_STORE_APPEND_ORACLE`) — the plain-layout
    twin (retired builder, kept unregistered) and the versioned-root
    twin with a manifest-flip compact between the runs (keeps the
    driver row) — and must produce row-for-row identical run-2
    decisions on the same feed: the store layout is query-invisible by
    design, and THIS is where that design claim is pinned.  If the
    versioned rewrite ever drops/duplicates rows or the layouts
    diverge, the retired family loses its coverage-by-proxy and this
    fails."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.queries_testdata import (
        QUERIES,
        dd_ingest_store_append,
    )

    assert "dd_ingest_store_append" not in QUERIES  # really retired
    a = dd_ingest_store_append(spark, SF0001)
    b = QUERIES["dd_ingest_versioned_store"](spark, SF0001)
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    plain = sorted(map(tuple, a.select(*cols).collect()))
    versioned = sorted(map(tuple, b.select(*cols).collect()))
    assert plain == versioned and len(plain) > 0


@pytest.mark.parametrize("name", sorted(oracle_sql()))
def test_oracle_sql_executes_in_duckdb(name):
    """Every oracle must at least run in DuckDB against the real tables —
    catches SQL syntax drift, CTE-inlining blowups, and file-handle
    exhaustion in seconds, without Spark and without the driver."""
    import duckdb

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.schemas import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF0001}/{t}.parquet')"
        )
    cur = con.execute(oracle_sql()[name])
    assert cur.description, f"{name}: no result schema"
    cur.fetchall()
    con.close()
