"""Stats operators: seeded rarefaction, Bray-Curtis, permutation test."""

import pytest
from pyspark.sql import functions as F

from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators import stats


def _abundance(spark):
    rows = [
        ("s1", "a", 10), ("s1", "b", 20), ("s1", "c", 70),
        ("s2", "a", 50), ("s2", "b", 50),
        ("s3", "d", 5),
    ]
    return spark.createDataFrame(rows, "sample string, item string, count long")


def test_rarefy_sums_to_depth(spark):
    r = stats.rarefy(_abundance(spark), "sample", "item", "count", depth=30)
    sums = {x["sample"]: x["t"] for x in r.groupBy("sample").agg(F.sum("count").alias("t")).collect()}
    assert sums == {"s1": 30, "s2": 30}  # s3 total 5 < depth → dropped


def test_rarefy_deterministic(spark):
    a = sorted(map(tuple, stats.rarefy(_abundance(spark), "sample", "item", "count", 30, seed=7).collect()))
    b = sorted(map(tuple, stats.rarefy(_abundance(spark), "sample", "item", "count", 30, seed=7).collect()))
    c = sorted(map(tuple, stats.rarefy(_abundance(spark), "sample", "item", "count", 30, seed=8).collect()))
    assert a == b
    assert a != c  # different seed → different draw (overwhelmingly)


def test_rarefy_respects_partitioning_invariance(spark):
    df = _abundance(spark)
    a = sorted(map(tuple, stats.rarefy(df, "sample", "item", "count", 30).collect()))
    b = sorted(map(tuple, stats.rarefy(df.repartition(7), "sample", "item", "count", 30).collect()))
    assert a == b  # seed derives from sample key, not partition layout


def test_rarefy_hash_sums_to_depth_and_drops_shallow(spark):
    r = stats.rarefy_hash(_abundance(spark), "sample", "item", "count", depth=30)
    sums = {x["sample"]: x["s"] for x in r.groupBy("sample").agg(F.sum("count").alias("s")).collect()}
    assert sums == {"s1": 30, "s2": 30}  # s3 (total 5) dropped


def test_rarefy_hash_partition_invariant(spark):
    df = _abundance(spark)
    a = sorted(map(tuple, stats.rarefy_hash(df, "sample", "item", "count", 30).collect()))
    b = sorted(map(tuple, stats.rarefy_hash(df.repartition(7), "sample", "item", "count", 30).collect()))
    assert a == b and len(a) > 0


def test_rarefy_hash_marginals_track_abundance(spark):
    # s1 has a 10/20/70 split; the kept 30 must never exceed the source
    # counts and the dominant item must stay dominant on average
    r = {x["item"]: x["count"] for x in
         stats.rarefy_hash(_abundance(spark), "sample", "item", "count", 30)
         .filter(F.col("sample") == "s1").collect()}
    assert sum(r.values()) == 30
    assert r.get("a", 0) <= 10 and r.get("b", 0) <= 20 and r.get("c", 0) <= 70
    assert r["c"] == max(r.values())


def test_bray_curtis_known_values(spark):
    # s1=(10,20,70), s2=(50,50,0): min-sum=10+20=30, totals 100+100
    # BC = 1 - 2*30/200 = 0.7
    bc = {(r.sample_a, r.sample_b): r.bray_curtis
          for r in stats.bray_curtis(_abundance(spark), "sample", "item", "count").collect()}
    assert bc[("s1", "s2")] == pytest.approx(0.7, abs=1e-6)
    # s3 shares nothing with s1 → BC = 1
    assert bc[("s1", "s3")] == pytest.approx(1.0, abs=1e-6)


def test_identical_samples_zero_distance(spark):
    rows = [("x", "a", 3), ("x", "b", 7), ("y", "a", 3), ("y", "b", 7)]
    df = spark.createDataFrame(rows, "sample string, item string, count long")
    bc = stats.bray_curtis(df, "sample", "item", "count").collect()[0]
    assert bc.bray_curtis == pytest.approx(0.0, abs=1e-9)


def test_rarefaction_curve_monotone_richness(spark):
    rows = [("s", f"i{i}", 2) for i in range(50)]  # 50 species, 100 individuals
    df = spark.createDataFrame(rows, "sample string, item string, count long")
    curve = {r.depth: r.richness
             for r in stats.rarefaction_curve(df, "sample", "item", "count", [10, 50, 100]).collect()}
    assert curve[10] <= curve[50] <= curve[100]
    assert curve[100] == 50  # full depth → all species


def test_permutation_pvalue_detects_difference(spark):
    rows = [("a", float(v)) for v in range(0, 20)] + [("b", float(v)) for v in range(100, 120)]
    df = spark.createDataFrame(rows, "grp string, val double")
    res = stats.permutation_pvalue(df, "grp", "val", n_perm=199).collect()[0]
    assert abs(res.observed_diff) == pytest.approx(100.0, abs=1e-6)
    assert res.p_value < 0.05


def test_permutation_pvalue_null(spark):
    # identical distributions → p should be large
    rows = [("a", float(v % 10)) for v in range(40)] + [("b", float(v % 10)) for v in range(40)]
    df = spark.createDataFrame(rows, "grp string, val double")
    res = stats.permutation_pvalue(df, "grp", "val", n_perm=199).collect()[0]
    assert res.p_value > 0.2


def test_permutation_portable_signal_and_null(spark):
    rows = [("a", v) for v in range(0, 20)] + [("b", v) for v in range(100, 120)]
    df = spark.createDataFrame(rows, "grp string, val long")
    res = stats.permutation_pvalue_portable(df, "grp", "val", n_perm=199).collect()[0]
    assert abs(res.observed_diff) == pytest.approx(100.0, abs=1e-6)
    assert res.p_value < 0.05
    null_rows = [("a", v % 10) for v in range(40)] + [("b", v % 10) for v in range(40)]
    ndf = spark.createDataFrame(null_rows, "grp string, val long")
    nres = stats.permutation_pvalue_portable(ndf, "grp", "val", n_perm=199).collect()[0]
    assert nres.p_value > 0.2


def test_rarefy_frame_depth_matches_int_depth(spark):
    rows = [(f"s{j}", f"i{v}", (v * 7) % 11 + 1) for j in range(4) for v in range(12)]
    df = spark.createDataFrame(rows, "s string, i string, c long")
    depth_df = df.groupBy("s").agg(F.sum("c").alias("t")).agg(F.min("t").alias("d"))
    d = depth_df.collect()[0]["d"]
    for fn in (stats.rarefy, stats.rarefy_hash):
        by_int = {(r.s, r.i): r.c for r in fn(df, "s", "i", "c", depth=int(d)).collect()}
        by_frame = {(r.s, r.i): r.c for r in fn(df, "s", "i", "c", depth=depth_df).collect()}
        assert by_int == by_frame


def test_sample_columns_deterministic(spark):
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.relational import sample_columns

    df = spark.createDataFrame([tuple(range(10))], ", ".join(f"c{i} int" for i in range(10)))
    a = sample_columns(df, keep=["c0"], fraction=0.4, seed=1).columns
    b = sample_columns(df, keep=["c0"], fraction=0.4, seed=1).columns
    c = sample_columns(df, keep=["c0"], fraction=0.4, seed=9).columns
    assert a == b
    assert "c0" in a
    assert a != c or len(a) != len(c)  # different seed → (almost surely) different pick


def test_permutation_unbalanced_groups_null(spark):
    # margin-preserving null: with a 6-vs-54 split from one distribution
    # the p-value must stay calibrated (a Bernoulli(1/2) reallocation
    # null inflates the variance here and over-rejects)
    rows = [("a", float(v)) for v in (0, 8, 1, 7, 2, 6)] + [
        ("b", float(v % 9)) for v in range(54)
    ]  # both groups mean 4.0
    df = spark.createDataFrame(rows, "grp string, val double")
    res = stats.permutation_pvalue(df, "grp", "val", n_perm=199).collect()[0]
    assert res.p_value > 0.2
    ldf = spark.createDataFrame(
        [(g, int(v)) for g, v in rows], "grp string, val long"
    )
    lres = stats.permutation_pvalue_portable(ldf, "grp", "val", n_perm=199).collect()[0]
    assert lres.p_value > 0.2


def test_permutation_pvalue_all_tied_values(spark):
    # regression: tied values used to share one permutation id, collapsing
    # the null distribution; all-equal groups must give p ≈ 1, not ≈ 0
    rows = [("a", 5.0)] * 20 + [("b", 5.0)] * 20
    df = spark.createDataFrame(rows, "grp string, val double")
    res = stats.permutation_pvalue(df, "grp", "val", n_perm=99).collect()[0]
    assert res.observed_diff == 0.0
    assert res.p_value == pytest.approx(1.0, abs=0.01)


def test_rarefy_hash_expression_depth_matches_explicit(spark):
    # depth="min(_t)" (global window over the internal per-sample totals)
    # must draw exactly what an explicit int depth equal to that min draws
    df = _abundance(spark)
    totals = df.groupBy("sample").agg(F.sum("count").alias("t")).collect()
    dmin = min(r.t for r in totals)
    a = sorted(map(tuple, stats.rarefy_hash(df, "sample", "item", "count", depth="min(_t)").collect()))
    b = sorted(map(tuple, stats.rarefy_hash(df, "sample", "item", "count", depth=int(dmin)).collect()))
    assert a == b and len(a) > 0


def test_rarefy_hash_ignores_zero_count_rows(spark):
    """Spark's sequence(1, 0) is DESCENDING [1, 0]: unfiltered
    zero-count rows would explode into two phantom individuals."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.stats import rarefy_hash

    with_zeros = spark.createDataFrame(
        [("s1", "a", 5), ("s1", "b", 0), ("s1", "c", 5), ("s2", "a", 10), ("s2", "z", 0)],
        "sample string, item string, count long",
    )
    out = rarefy_hash(with_zeros, "sample", "item", "count", depth=6).collect()
    items = {(r.sample, r.item) for r in out}
    assert ("s1", "b") not in items and ("s2", "z") not in items
    per_sample = {}
    for r in out:
        per_sample[r.sample] = per_sample.get(r.sample, 0) + r["count"]
    assert per_sample == {"s1": 6, "s2": 6}
    # identical draw with the zero rows pre-dropped
    no_zeros = with_zeros.filter("count > 0")
    same = rarefy_hash(no_zeros, "sample", "item", "count", depth=6).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, same))


def test_rarefaction_curve_rejects_empty_depths(spark):
    import pytest as _pytest

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.stats import (
        rarefaction_curve,
        rarefaction_curve_hash,
    )

    df = spark.createDataFrame([("s", "i", 5)], "sample string, item string, count long")
    for fn in (rarefaction_curve, rarefaction_curve_hash):
        with _pytest.raises(ValueError, match="non-empty"):
            fn(df, "sample", "item", "count", depths=[])


def test_permutation_family_equivalence(spark):
    """Adjudication for the r08 retirement of the m4_permutation_test
    registry entry: permutation_pvalue (xxhash64 family) and
    permutation_pvalue_portable (md5-60 family) compute THE SAME
    statistic over the same margin-preserving derivation — on integer
    data they must agree exactly on observed_diff and n_perm, and on
    the two inputs where the null distribution is determined regardless
    of which uniform permutation family generated it (all-tied: every
    permuted diff is 0, and fully-separated: no permuted diff reaches
    the observed one), the p-values must be bit-identical too.  Only
    the intermediate permutation draws may differ between families."""
    import pytest as _pt

    sep = [("a", v) for v in range(0, 20)] + [("b", v) for v in range(1000, 1020)]
    tied = [("a", 5)] * 20 + [("b", 5)] * 20
    for rows, exp_p in ((sep, 1.0 / 200.0), (tied, 1.0)):
        df_d = spark.createDataFrame(
            [(g, float(v)) for g, v in rows], "grp string, val double"
        )
        df_l = spark.createDataFrame(rows, "grp string, val long")
        a = stats.permutation_pvalue(df_d, "grp", "val", n_perm=199, seed=42).collect()[0]
        b = stats.permutation_pvalue_portable(df_l, "grp", "val", n_perm=199, seed=42).collect()[0]
        assert a.observed_diff == b.observed_diff
        assert a.n_perm == b.n_perm == 199
        assert a.p_value == _pt.approx(exp_p, abs=1e-9)
        assert b.p_value == _pt.approx(exp_p, abs=1e-9)


def test_rarefaction_facade_routes_by_volume(spark):
    """The auto-routing facade picks rarefy_hash below the per-core
    explode budget and rarefy above it, and each route's output is
    BIT-IDENTICAL to calling that route directly — route choice is
    observable because the two draws use different RNG families."""
    df = _abundance(spark)
    via_hash = sorted(map(tuple, stats.rarefy_hash(df, "sample", "item", "count", 30).collect()))
    via_arrow = sorted(map(tuple, stats.rarefy(df, "sample", "item", "count", 30).collect()))
    assert via_hash != via_arrow  # distinguishable draws → route is observable

    # Σ counts = 205 « budget → explode route
    small = sorted(map(tuple, stats.rarefaction(df, "sample", "item", "count", 30).collect()))
    assert small == via_hash
    # budget forced to 0 per core → Arrow route
    big = sorted(map(tuple, stats.rarefaction(
        df, "sample", "item", "count", 30, explode_budget_per_core=0
    ).collect()))
    assert big == via_arrow


def test_rarefaction_facade_hint_skips_the_counting_job(spark):
    """`total_individuals` is trusted verbatim: a huge hint routes to
    the Arrow path even though the actual Σ counts is tiny (and vice
    versa), so callers that already know the volume pay zero extra
    jobs and can pin a route."""
    df = _abundance(spark)
    via_arrow = sorted(map(tuple, stats.rarefy(df, "sample", "item", "count", 30).collect()))
    hinted = sorted(map(tuple, stats.rarefaction(
        df, "sample", "item", "count", 30, total_individuals=10**12
    ).collect()))
    assert hinted == via_arrow


def test_rarefaction_facade_expression_depth_both_routes(spark):
    """The "min(_t)" expression-depth form works on BOTH routes: the
    facade translates it into a broadcast depth frame for the Arrow
    route (which lacks the expression form natively).  min total here
    is s3's 5, so every sample survives at depth 5."""
    df = _abundance(spark)
    for kw in ({}, {"explode_budget_per_core": 0}):
        r = stats.rarefaction(df, "sample", "item", "count", "min(_t)", **kw)
        sums = {x["sample"]: x["s"] for x in
                r.groupBy("sample").agg(F.sum("count").alias("s")).collect()}
        assert sums == {"s1": 5, "s2": 5, "s3": 5}


def test_rarefaction_facade_single_scan_and_filtered_routing(spark):
    """The r08 ADVICE item: when the facade must consume `df` more than
    once (routing aggregate + route, or the `_t` depth translation), it
    lazily localCheckpoints the frame FIRST, so a caller's expensive
    upstream plan is scanned once — the returned plan must not
    re-derive the upstream join.  And the routing aggregate + `_t`
    totals apply the routes' count>0 filter, closing the
    routing/depth asymmetry (zero/negative rows draw no individuals in
    either route, so they must not steer route choice or depth)."""
    df = _abundance(spark)
    # an upstream plan with a join the facade must not re-run per consumer
    dim = spark.createDataFrame(
        [("s1",), ("s2",), ("s3",)], "sample string"
    )
    joined = df.join(dim, "sample")

    # unhinted → routing aggregate + Arrow route: plan is checkpoint-fed
    out = stats.rarefaction(joined, "sample", "item", "count", 5,
                            explode_budget_per_core=0)
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Join" not in plan, "facade re-derived the upstream join per consumer"
    sums = {r["sample"]: r["s"] for r in
            out.groupBy("sample").agg(F.sum("count").alias("s")).collect()}
    assert sums == {"s1": 5, "s2": 5, "s3": 5}

    # hinted + str depth on the Arrow route → the translation is the
    # second consumer; same single-scan property
    out2 = stats.rarefaction(joined, "sample", "item", "count", "min(_t)",
                             total_individuals=10**12)
    plan2 = out2._jdf.queryExecution().explainString(
        out2._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the depth frame's broadcast crossJoin is part of the route; the
    # UPSTREAM equi-join must not reappear (checkpoint-fed both times)
    assert "BroadcastHashJoin" not in plan2 and "SortMergeJoin" not in plan2
    sums2 = {r["sample"]: r["s"] for r in
             out2.groupBy("sample").agg(F.sum("count").alias("s")).collect()}
    assert sums2 == {"s1": 5, "s2": 5, "s3": 5}

    # count<=0 rows must not steer the ROUTE: zeros and negatives are
    # invisible to the routing sum, so the draw equals the clean
    # frame's draw on the explode route (which filters them itself)
    noisy = df.unionByName(spark.createDataFrame(
        [("s1", "zzz", 0), ("s2", "yyy", -7)],
        "sample string, item string, count long",
    ))
    clean = sorted(map(tuple, stats.rarefaction(
        df, "sample", "item", "count", 5).collect()))
    got = sorted(map(tuple, stats.rarefaction(
        noisy, "sample", "item", "count", 5).collect()))
    assert got == clean

    # ...and not distort the `_t` totals behind an expression depth:
    # with the negative row included s2's total would undercount and
    # "min(_t)" would pick the wrong global depth
    got_expr = sorted(map(tuple, stats.rarefaction(
        noisy, "sample", "item", "count", "min(_t)").collect()))
    clean_expr = sorted(map(tuple, stats.rarefaction(
        df, "sample", "item", "count", "min(_t)").collect()))
    assert got_expr == clean_expr


def test_rarefaction_curve_family_equivalence(spark):
    """Adjudication for the r09 retirement of the m13_rarefaction_curve
    registry entry: rarefaction_curve (seeded-numpy draws via rarefy)
    and rarefaction_curve_hash (md5 hash-rank draws) compute THE SAME
    statistic — per-sample richness after an exact multivariate-
    hypergeometric subsample to each depth, short samples dropped —
    differing ONLY in the random draw family.  They must agree exactly
    wherever the statistic is determined regardless of which uniform
    draw realized it: (a) depth == community size keeps every
    individual (richness = item count), (b) depth > community size
    drops the sample, (c) a single-item community has richness 1 at
    any feasible depth; and on a general frame the ELIGIBLE (sample,
    depth) key set is draw-independent, as is the schema."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.stats import (
        rarefaction_curve,
        rarefaction_curve_hash,
    )

    det = spark.createDataFrame(
        [
            # s_full: total 10 → fully determined at depth 10, dropped at 12
            ("s_full", "a", 4), ("s_full", "b", 5), ("s_full", "c", 1),
            # s_one: single item, richness 1 at any depth <= 20
            ("s_one", "x", 20),
        ],
        "sample string, item string, count long",
    )
    depths = [10, 12, 20]
    a = {(r["sample"], r.depth): r.richness
         for r in rarefaction_curve(det, "sample", "item", "count", depths).collect()}
    b = {(r["sample"], r.depth): r.richness
         for r in rarefaction_curve_hash(det, "sample", "item", "count", depths).collect()}
    expected = {
        ("s_full", 10): 3,           # every individual kept
        ("s_one", 10): 1, ("s_one", 12): 1, ("s_one", 20): 1,
    }                                # s_full dropped at 12 and 20
    assert a == b == expected

    gen = _abundance(spark)
    ga = rarefaction_curve(gen, "sample", "item", "count", [5, 40]).collect()
    gb = rarefaction_curve_hash(gen, "sample", "item", "count", [5, 40]).collect()
    assert {(r["sample"], r.depth) for r in ga} == {(r["sample"], r.depth) for r in gb}
    assert ga[0].asDict().keys() == gb[0].asDict().keys()
    # only the intermediate draws may differ; richness stays in-bounds
    n_items = {r["sample"]: r.n for r in
               gen.groupBy("sample").agg(F.countDistinct("item").alias("n")).collect()}
    for rows in (ga, gb):
        for r in rows:
            assert 1 <= r.richness <= n_items[r["sample"]]


def test_rarefaction_facade_filters_routes_and_pins_one_copy(spark):
    """Review fixes on the facade: (a) count<=0 rows are filtered out
    of the frame handed to BOTH routes — previously a negative count
    reached numpy's hypergeometric on the Arrow route and crashed the
    task; (b) when the facade materializes the frame for routing, the
    explode route recognizes the checkpointed input (_cheap_replay)
    and skips its own internal checkpoint, so at most the facade copy
    + the candidate pool are ever pinned — not a second full copy of
    the abundance table."""
    df = _abundance(spark)
    noisy = df.unionByName(spark.createDataFrame(
        [("s1", "zz", 0), ("s2", "neg", -7)],
        "sample string, item string, count long",
    ))
    # Arrow route on the noisy frame: no crash, realization equals
    # rarefy over the clean frame (the filter is the only difference)
    got = sorted(map(tuple, stats.rarefaction(
        noisy, "sample", "item", "count", 5, explode_budget_per_core=0
    ).collect()))
    want = sorted(map(tuple, stats.rarefy(df, "sample", "item", "count", 5).collect()))
    assert got == want

    # pinned-copy bound on the explode route (unhinted → facade
    # checkpoint): materializing the result adds the facade frame + the
    # candidate pool, NOT a third copy from rarefy_hash's internal
    # checkpoint
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    out = stats.rarefaction(df, "sample", "item", "count", 5)
    assert out.count() > 0
    assert jsc.getPersistentRDDs().size() - before <= 2


def test_rarefy_draw_matches_per_group_reference(spark):
    """r12 optimization pin: rarefy's partition-at-a-time mapInPandas
    stage must reproduce the ORIGINAL per-group draw contract exactly —
    items in canonical (sorted) order, generator seeded
    sha256('{seed}:{sample}'), one multivariate-hypergeometric draw per
    sample, kept>0 rows only, samples with total < depth dropped. The
    reference below is the straight per-group form the operator shipped
    with before the partition-batched rewrite."""
    import numpy as np

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.stats import _seed_for

    rows = [
        ("s1", "a", 10), ("s1", "b", 20), ("s1", "c", 70),
        ("s2", "a", 50), ("s2", "b", 50),
        ("s3", "d", 5),  # total 5 < depth → dropped
        ("s4", "x", 3), ("s4", "y", 4), ("s4", "z", 40),
    ]
    depth, seed = 30, 11
    expected = []
    by_sample: dict = {}
    for s, i, c in rows:
        by_sample.setdefault(s, []).append((i, c))
    for s, items in by_sample.items():
        items = sorted(items)  # canonical item order
        counts = np.array([c for _, c in items], dtype=np.int64)
        if int(counts.sum()) < depth:
            continue
        rng = np.random.default_rng(_seed_for(s, seed))
        kept = rng.multivariate_hypergeometric(counts, depth)
        expected.extend(
            (s, items[j][0], int(kept[j])) for j in range(len(items)) if kept[j] > 0
        )
    df = spark.createDataFrame(rows, "sample string, item string, count long")
    got = sorted(map(tuple, stats.rarefy(df, "sample", "item", "count", depth, seed=seed).collect()))
    assert got == sorted(expected)
