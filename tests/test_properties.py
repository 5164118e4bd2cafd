"""Property-based tests (hypothesis) for algebraic invariants the
operators must hold on ANY input — the engine's analog of the reference's
degradation/property tests (SURVEY §5).

Spark round trips are slow, so examples are small and capped; the
properties themselves are the point: reshape round-trips, normalizer
idempotence, metric bounds/symmetry, dedup keeper sanity.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions.scalar import sanitize_key
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import dedup, stats
from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import melt, pivot_matrix

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.sampled_from(["a", "b", "c", "d"])
cats = st.sampled_from(["X", "Y"])


@SLOW
@given(
    rows=st.lists(
        st.tuples(keys, cats, st.integers(min_value=0, max_value=100)),
        min_size=1,
        max_size=12,
    )
)
def test_pivot_melt_roundtrip_preserves_sums(spark, rows):
    """sum over melt(pivot(x)) == sum over x (reshape conserves mass)."""
    df = spark.createDataFrame(rows, "k string, c string, v long")
    piv = pivot_matrix(df, "k", "c", "v", values=["X", "Y"])
    back = melt(piv, ["k"], ["X", "Y"], var_name="c", value_name="v")
    total_in = df.agg(F.sum("v")).collect()[0][0] or 0
    total_out = back.agg(F.sum("v")).collect()[0][0] or 0
    assert total_in == total_out


@SLOW
@given(s=st.text(max_size=40))
def test_sanitize_key_idempotent(spark, s):
    """sanitize(sanitize(x)) == sanitize(x); output ∈ [A-Za-z0-9_]*."""
    df = spark.createDataFrame([(s,)], "raw string")
    once = df.select(sanitize_key("raw").alias("x"))
    twice = once.select(sanitize_key("x").alias("x"))
    a, b = once.collect()[0].x, twice.collect()[0].x
    assert a == b
    assert all(ch.isalnum() or ch == "_" for ch in a)


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.sampled_from(["i1", "i2", "i3", "i4"]),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=2,
        max_size=10,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_bray_curtis_bounds(spark, rows):
    """0 ≤ BC ≤ 1 for any non-negative abundance table."""
    df = spark.createDataFrame(rows, "sample string, item string, count long")
    out = stats.bray_curtis(df, "sample", "item", "count").collect()
    for r in out:
        assert -1e-9 <= r.bray_curtis <= 1 + 1e-9


@SLOW
@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=30), min_size=1, max_size=6
    )
)
def test_exact_dedup_partition_property(spark, texts):
    """Every doc gets exactly one keeper; keepers are their own keeper;
    docs with equal normalized text share a keeper."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.exact_dedup(df).collect()
    assert len(out) == len(rows)
    by_id = {r.id: r for r in out}
    for r in out:
        assert by_id[r.keeper_id].is_dup == 0  # keeper is canonical
        assert by_id[r.keeper_id].fingerprint == r.fingerprint


@SLOW
@given(
    weights=st.lists(st.integers(min_value=1, max_value=100), min_size=1, max_size=8)
)
def test_entropy_bounds(spark, weights):
    """0 ≤ H ≤ ln(k) for k incident edges."""
    import math

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.kernels import node_entropy

    rows = [("n", f"m{i}", float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "src string, dst string, weight double")
    h = node_entropy(df).collect()[0].entropy
    assert -1e-6 <= h <= math.log(len(weights)) + 1e-6


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.sampled_from(["i1", "i2", "i3", "i4"]),
            st.integers(min_value=1, max_value=30),
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda r: (r[0], r[1]),
    ),
    depth=st.integers(min_value=1, max_value=40),
)
def test_rarefy_hash_invariants(spark, rows, depth):
    """For ANY abundance table: kept counts never exceed source counts;
    every surviving sample sums exactly to depth; samples below depth
    are dropped entirely."""
    df = spark.createDataFrame(rows, "sample string, item string, count long")
    out = stats.rarefy_hash(df, "sample", "item", "count", depth=depth)
    src = {(r["sample"], r["item"]): r["count"] for r in df.collect()}
    totals: dict[str, int] = {}
    for r in out.collect():
        assert r["count"] <= src[(r["sample"], r["item"])]
        totals[r["sample"]] = totals.get(r["sample"], 0) + r["count"]
    src_totals: dict[str, int] = {}
    for (s, _), c in src.items():
        src_totals[s] = src_totals.get(s, 0) + c
    for s, t in src_totals.items():
        if t >= depth:
            assert totals.get(s) == depth
        else:
            assert s not in totals


@SLOW
@given(
    n=st.integers(min_value=1, max_value=40),
    frac=st.sampled_from([0.0, 0.3, 0.7, 1.0]),
    seed=st.integers(min_value=0, max_value=3),
)
def test_sample_edges_subset_and_nesting(spark, n, frac, seed):
    """Hash-filter sampling: result ⊆ input; frac=1 keeps all, frac=0
    none; and samples NEST — a higher fraction keeps a superset of a
    lower one (same seed), because the keep rule is a threshold on one
    per-edge hash. df.sample has no such property."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import kernels as K

    rows = [(f"p{i}", f"h{i % 5}") for i in range(n)]
    e = spark.createDataFrame(rows, "src string, dst string")
    lo = set(map(tuple, K.sample_edges(e, frac, seed=seed).collect()))
    hi = set(map(tuple, K.sample_edges(e, min(1.0, frac + 0.3), seed=seed).collect()))
    assert lo <= set(rows)
    assert lo <= hi
    if frac >= 1.0:
        assert lo == set(rows)
    if frac == 0.0:
        assert lo == set()


@SLOW
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 30),
    chunk=st.integers(7, 400),
)
def test_fastq_chunk_split_invariant(spark, seed, n, chunk):
    """Any chunk size must reproduce the whole-file FASTQ parse exactly
    (record ownership = header byte; ambiguous '@' quality lines)."""
    import random as _random
    import tempfile

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.sources import readers as R

    rng = _random.Random(seed)
    recs = []
    with tempfile.NamedTemporaryFile("w", suffix=".fastq", delete=False) as fh:
        for i in range(n):
            rid = f"r{i}"
            seq = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 40)))
            qual = "".join(rng.choice("@+!IJ#") for _ in range(len(seq)))
            fh.write(f"@{rid}\n{seq}\n+\n{qual}\n")
            recs.append((rid, seq, qual))
        path = fh.name
    got = {
        (r.read_id, r.seq, r.qual)
        for r in R.read_fastq_parallel(spark, path, chunk_bytes=chunk).collect()
    }
    assert got == set(recs)


words = st.sampled_from(["ab", "cd", "ef", "gh", "ij"])


@SLOW
@given(
    texts=st.lists(
        st.lists(words, min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    ct=st.integers(min_value=1, max_value=5),
)
def test_chunk_dedup_invariants(spark, texts, ct):
    """For any corpus and chunk size: chunk count per doc is
    ceil(tokens/ct); every fingerprint group has exactly one keeper
    (is_dup=0) and it is the lexicographically minimal (id, idx)."""
    import math

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.chunk_dedup(df, chunk_tokens=ct).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.id, 0)
        per_doc[r.id] += 1
    for i, t in rows:
        assert per_doc[i] == math.ceil(len(t.split()) / ct)
    by_fp = {}
    for r in out:
        by_fp.setdefault(r.fingerprint, []).append(r)
    for grp in by_fp.values():
        keepers = [r for r in grp if r.is_dup == 0]
        assert len(keepers) == 1
        lo = min((r.id, r.chunk_idx) for r in grp)
        assert (keepers[0].id, keepers[0].chunk_idx) == lo
        assert all((r.keeper_id, r.keeper_idx) == lo for r in grp)


@SLOW
@given(
    n=st.integers(min_value=1, max_value=400),
    w=st.tuples(
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=1, max_value=8),
    ),
    seed=st.integers(min_value=0, max_value=99),
)
def test_split_assign_total_and_determinism(spark, n, w, seed):
    """Every row gets exactly one split; assignment is a pure function
    of (id, seed) — invariant under repartitioning and re-evaluation."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.corpus import split_assign

    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in split_assign(df, weights=w, seed=seed).collect()}
    b = {
        r.doc_id: r.split
        for r in split_assign(df.repartition(5), weights=w, seed=seed).collect()
    }
    assert a == b and len(a) == n
    assert set(a.values()) <= {"train", "val", "test"}


@SLOW
@given(
    texts=st.lists(
        st.lists(words, min_size=2, max_size=14).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_repetition_stats_bounds(spark, texts):
    """For any doc: 0 ≤ entropy ≤ ln(distinct n-grams); 1/total ≤
    top_share ≤ 1; 0 ≤ dup_ratio < 1; and entropy = 0 iff one distinct
    n-gram carries all the mass (top_share = 1)."""
    import math

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.corpus import repetition_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for r in repetition_stats(df, n=2).collect():
        toks = texts[r.id].split()
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        total, distinct = len(grams), len(set(grams))
        # all three stats are rounded to 6 places → 5e-7 quantization
        assert -1e-6 <= r.ngram_entropy <= math.log(distinct) + 1e-6
        assert 1 / total - 1e-6 <= r.top_ngram_share <= 1 + 1e-6
        assert -1e-6 <= r.dup_ngram_ratio < 1
        assert (r.ngram_entropy == 0.0) == (r.top_ngram_share == 1.0)


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs"),
                whitelist_characters="@.\n+-",
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_pii_scrub_idempotent_and_line_filter_stable(spark, texts):
    """Scrubbing is idempotent (sentinels never re-match any pattern),
    and line_filter is a projection: every kept line already satisfies
    the rules, so filtering its own output is a fixed point."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import corpus

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = corpus.pii_scrub(df).select(
        F.col("id").alias("doc_id"), F.col("clean_text").alias("text")
    )
    twice = corpus.pii_scrub(once)
    a = {r.id: r.clean_text for r in once.withColumnRenamed("text", "clean_text")
         .withColumnRenamed("doc_id", "id").collect()}
    b = {r.id: r.clean_text for r in twice.collect()}
    assert a == b
    # second scrub found nothing left to count
    for r in twice.collect():
        assert (r.n_email, r.n_ipv4, r.n_phone) == (0, 0, 0)

    lf1 = corpus.line_filter(df).select(
        F.col("id").alias("doc_id"), F.col("clean_text").alias("text")
    )
    lf2 = corpus.line_filter(lf1)
    kept1 = {r.id: r.clean_text for r in corpus.line_filter(df).collect()}
    kept2 = {r.id: r.clean_text for r in lf2.collect()}
    assert kept1 == kept2


@SLOW
@given(
    n=st.integers(min_value=1, max_value=60),
    budget=st.integers(min_value=4, max_value=64),
    nb=st.integers(min_value=1, max_value=6),
)
def test_sequence_pack_conservation(spark, n, budget, nb):
    """Packing conserves every token exactly once per bucket: sorting a
    bucket's docs by (pack_id, pack_offset) reconstructs a gapless
    running sum from zero — no token lost, none double-assigned."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import corpus

    df = spark.createDataFrame(
        [(i, "w " * (1 + (i * 7) % 9)) for i in range(n)], "doc_id long, text string"
    )
    out = corpus.sequence_pack(df, budget=budget, n_buckets=nb).collect()
    assert len(out) == n
    per_bucket = {}
    for r in sorted(out, key=lambda r: (r.bucket, r.pack_id * budget + r.pack_offset)):
        pos = per_bucket.get(r.bucket, 0)
        assert r.pack_id * budget + r.pack_offset == pos
        per_bucket[r.bucket] = pos + r.n_tok


# --- y4m codec properties (pure numpy — no Spark session, so these run
# with a generous example budget) --------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    fps=st.integers(1, 120),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_c444_roundtrip_property(n, h, w, fps, seed):
    """encode→decode at C444 must round-trip every pixel within the
    ±2 quantization of the limited-range matrix, preserve (n, h, w),
    and report the exact frame rate — for ANY geometry."""
    import numpy as np

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import multimodal as MM

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    got_fps, dec = MM.decode_y4m(MM.encode_y4m(frames, fps=fps, cfmt="444"))
    assert got_fps == float(fps)
    assert dec.shape == frames.shape
    assert int(np.abs(dec.astype(int) - frames.astype(int)).max()) <= 2


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 3),
    h2=st.integers(1, 5),
    w2=st.integers(1, 5),
    cut=st.integers(0, 40),
)
def test_y4m_truncation_always_valueerror(n, h2, w2, cut):
    """ANY truncation of a valid stream must raise ValueError (the
    quarantine contract) — never IndexError/ZeroDivisionError or a
    silent short decode past a chopped frame payload."""
    import numpy as np

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import multimodal as MM

    frames = np.zeros((n, 2 * h2, 2 * w2, 3), np.uint8)
    data = MM.encode_y4m(frames, fps=10, cfmt="420jpeg")
    trunc = data[: len(data) - 1 - cut]
    try:
        _, dec = MM.decode_y4m(trunc)
        # a cut inside the LAST frame's payload or header must not
        # yield that frame; whole earlier frames may legitimately decode
        assert dec.shape[0] < n
    except ValueError:
        pass


@SLOW
@given(
    left=st.lists(
        st.tuples(keys, st.integers(min_value=-50, max_value=50)),
        min_size=0,
        max_size=12,
    ),
    right=st.lists(
        st.tuples(keys, cats),
        min_size=0,
        max_size=6,
    ),
    buckets=st.sampled_from([1, 3, 16]),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_equals_plain_join(spark, left, right, buckets, how):
    """salted_join(l, r, on, buckets, how) must return EXACTLY the plain
    join's row multiset for any input — duplicate keys, missing keys,
    duplicate right rows, bucket count 1..16, inner and left — because
    the salt is an internal spreading device, never a semantic key.
    (The skew fixture pins one instance; this pins the algebra.)"""
    l = spark.createDataFrame(left, "k string, v long") if left else (
        spark.createDataFrame([], "k string, v long")
    )
    r = spark.createDataFrame(right, "k string, c string") if right else (
        spark.createDataFrame([], "k string, c string")
    )
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import salted_join

    plain = l.join(r, "k", how)
    salted = salted_join(l, r, on="k", buckets=buckets, how=how)
    assert salted.schema.fieldNames() == plain.schema.fieldNames()
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


@SLOW
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),          # id
            st.integers(min_value=0, max_value=4),          # _epoch
            st.sampled_from(["new", "dup_store", "dup_batch"]),
            st.sampled_from(["f1", "f2", "f3"]),            # fingerprint
        ),
        min_size=1,
        max_size=16,
    )
)
def test_read_gate_decisions_resolution_properties(spark, rows):
    """The decisions-log resolution must hold on ANY log — including
    the legacy divergences the pre-r08 append protocol could leave
    (two different rows for one id under one epoch): (a) one row per
    id; (b) _epoch == the id's smallest logged epoch; (c) the chosen
    payload is the DETERMINISTIC minimum over (epoch, payload) — so
    re-resolving, repartitioning, or resolving the RESOLUTION itself
    can never flip a decision (idempotence); (d) within an id's
    earliest epoch, divergent statuses resolve to the lexicographic
    minimum — 'dup_batch'/'dup_store' before 'new', the conservative
    never-double-admit order.  Targets `_resolve_gate_decisions`, the
    resolution body — the public read_gate_decisions is that plus the
    r11 mid-fold maintenance fail-fast, which needs a real FS and is
    covered in test_sources_streaming_mm.py."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.streaming.events import (
        _resolve_gate_decisions,
    )

    df = spark.createDataFrame(rows, "id long, _epoch int, status string, fingerprint string")

    class _FakeReader:
        def __init__(self, frame):
            self._f = frame
        def parquet(self, _):
            return self._f

    class _FakeSession:
        def __init__(self, frame):
            self.read = _FakeReader(frame)

    out = {
        r.id: r
        for r in _resolve_gate_decisions(_FakeSession(df), "ignored").collect()
    }
    by_id = {}
    for i, e, s, f in rows:
        by_id.setdefault(i, []).append((e, s, f))
    assert set(out) == set(by_id)                      # (a)
    for i, logged in by_id.items():
        min_epoch = min(e for e, _, _ in logged)
        assert out[i]._epoch == min_epoch              # (b)
        # (c)+(d): min over (epoch, payload-tuple) in column order
        exp_s, exp_f = min((s, f) for e, s, f in logged if e == min_epoch)
        assert (out[i].status, out[i].fingerprint) == (exp_s, exp_f)
    # idempotence: resolving the resolution (reordered) is a fixpoint
    resolved = spark.createDataFrame(
        [(r.id, r._epoch, r.status, r.fingerprint) for r in out.values()],
        "id long, _epoch int, status string, fingerprint string",
    ).repartition(5)
    again = {
        r.id: r for r in _resolve_gate_decisions(_FakeSession(resolved), "x").collect()
    }
    assert {(r.id, r._epoch, r.status, r.fingerprint) for r in again.values()} == {
        (r.id, r._epoch, r.status, r.fingerprint) for r in out.values()
    }
