"""Client-side M3/M5/M6 helpers: special functions against published
table values, rank tests against closed-form extremes, ordination
against geometrically known configurations. No Spark session needed
except the collect_distance_matrix bridge test."""

import math

import numpy as np
import pytest

from hannigan_conjunctisviribus_ploscompbio_2017_spark import client as C


def test_chi2_sf_table_values():
    # standard χ² critical values: P(X > 3.841; df=1) = .05, etc.
    assert C.chi2_sf(3.841, 1) == pytest.approx(0.05, abs=5e-4)
    assert C.chi2_sf(5.991, 2) == pytest.approx(0.05, abs=5e-4)
    assert C.chi2_sf(6.635, 1) == pytest.approx(0.01, abs=5e-4)
    assert C.chi2_sf(0.0, 3) == 1.0
    assert C.chi2_sf(100.0, 1) < 1e-20


def test_normal_sf_and_ppf():
    assert C.normal_sf(1.959964) == pytest.approx(0.025, abs=1e-6)
    assert C.normal_sf(0.0) == pytest.approx(0.5, abs=1e-12)
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.client.stats import _normal_ppf

    assert _normal_ppf(0.975) == pytest.approx(1.959964, abs=1e-6)
    assert _normal_ppf(0.5) == pytest.approx(0.0, abs=1e-8)
    assert _normal_ppf(0.001) == pytest.approx(-3.090232, abs=1e-5)


def test_wilcoxon_signed_rank_signal_and_null():
    x = np.arange(1.0, 21.0)
    res = C.wilcoxon_signed_rank(x + 5.0, x)  # every pair shifted up
    assert res["statistic"] == 20 * 21 / 2  # all positive ranks
    assert res["p_value"] < 0.001
    # antisymmetric differences → W at its mean, p ≈ 1
    d = np.array([1.0, -1.0, 2.0, -2.0, 3.0, -3.0, 4.0, -4.0, 5.0, -5.0])
    res = C.wilcoxon_signed_rank(x[:10] + d, x[:10])
    assert res["p_value"] > 0.8


def test_mann_whitney_extremes():
    lo = np.arange(1.0, 11.0)
    hi = lo + 100.0
    res = C.mann_whitney_u(hi, lo)
    assert res["statistic"] == 100.0  # n1·n2, total dominance
    assert res["p_value"] < 0.001
    res = C.mann_whitney_u(lo, hi)
    assert res["statistic"] == 0.0
    # identical samples → p ≈ 1
    res = C.mann_whitney_u(lo, lo)
    assert res["p_value"] > 0.9


def test_kruskal_wallis_matches_rank_sum_for_two_groups():
    rng = np.random.default_rng(7)
    a, b = rng.normal(0, 1, 30), rng.normal(0.8, 1, 30)
    vals = np.concatenate([a, b])
    grp = np.array(["a"] * 30 + ["b"] * 30)
    kw = C.kruskal_wallis(vals, grp)
    mw = C.mann_whitney_u(a, b)
    # KW with k=2 is the square of the rank-sum z (asymptotically):
    # p-values agree up to the continuity correction
    assert kw["p_value"] == pytest.approx(mw["p_value"], abs=0.02)
    assert kw["df"] == 1


def test_kruskal_wallis_separated_groups():
    vals = np.concatenate([np.arange(10), np.arange(100, 110), np.arange(200, 210)])
    grp = np.array(["a"] * 10 + ["b"] * 10 + ["c"] * 10)
    res = C.kruskal_wallis(vals, grp)
    assert res["df"] == 2
    assert res["p_value"] < 1e-5


def test_pairwise_wilcox_holm_monotone():
    vals = np.concatenate([np.arange(10), np.arange(5, 15), np.arange(100, 110)])
    grp = np.array(["a"] * 10 + ["b"] * 10 + ["c"] * 10)
    rows = C.pairwise_wilcox(vals, grp)
    assert len(rows) == 3
    for r in rows:
        assert r["p_adjusted"] >= r["p_value"]
    ac = next(r for r in rows if r["group_a"] == "a" and r["group_b"] == "c")
    ab = next(r for r in rows if r["group_a"] == "a" and r["group_b"] == "b")
    assert ac["p_adjusted"] < 0.01
    assert ab["p_value"] > ac["p_value"]


def test_kruskalmc_separated_vs_merged():
    vals = np.concatenate([np.arange(10), np.arange(2, 12), np.arange(100, 110)])
    grp = np.array(["a"] * 10 + ["b"] * 10 + ["c"] * 10)
    rows = {(r["group_a"], r["group_b"]): r for r in C.kruskalmc(vals, grp)}
    assert rows[("a", "c")]["significant"]
    assert rows[("b", "c")]["significant"]
    assert not rows[("a", "b")]["significant"]
    for r in rows.values():
        assert r["critical_dif"] > 0


def _two_cluster_dist(n_per: int = 5, sep: float = 10.0, seed: int = 3):
    rng = np.random.default_rng(seed)
    a = rng.normal(0.0, 0.5, size=(n_per, 2))
    b = rng.normal(sep, 0.5, size=(n_per, 2))
    pts = np.vstack([a, b])
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    g = np.array(["a"] * n_per + ["b"] * n_per)
    return d, g, pts


def test_anosim_perfect_separation_and_null():
    d, g, _ = _two_cluster_dist()
    res = C.anosim(d, g, n_perm=199)
    assert res["statistic"] == pytest.approx(1.0, abs=1e-9)  # all between > all within
    assert res["p_value"] < 0.05
    rng = np.random.default_rng(0)
    res_null = C.anosim(d, rng.permutation(g), n_perm=199, seed=1)
    assert res_null["statistic"] < 0.5


def test_pcoa_recovers_euclidean_configuration():
    pts = np.array([[0.0, 0.0], [3.0, 0.0], [0.0, 4.0], [3.0, 4.0]])
    d = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
    coords, vals = C.pcoa(d, k=2)
    d2 = np.sqrt(((coords[:, None] - coords[None, :]) ** 2).sum(-1))
    assert np.allclose(d, d2, atol=1e-8)
    assert (vals[2:] < 1e-8).all()  # rank 2 configuration


def test_betadisper_dispersion_difference():
    rng = np.random.default_rng(11)
    tight = rng.normal(0, 0.1, size=(12, 2))
    loose = rng.normal(0, 3.0, size=(12, 2))
    pts = np.vstack([tight, loose])
    d = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1))
    g = np.array(["t"] * 12 + ["l"] * 12)
    res = C.betadisper(d, g, n_perm=199)
    assert res["f_statistic"] > 10
    assert res["p_value"] < 0.05
    # same dispersion → not significant
    same = np.random.default_rng(99).normal(0, 1.0, size=(24, 2))
    d2 = np.sqrt(((same[:, None] - same[None, :]) ** 2).sum(-1))
    res2 = C.betadisper(d2, g, n_perm=199)
    assert res2["p_value"] > 0.05


def test_nmds_embeddable_and_monotone_invariant():
    d, _, _ = _two_cluster_dist(n_per=6, sep=5.0)
    res = C.nmds(d, k=2, seed=5)
    assert res["stress"] < 0.05  # 2-D data embeds in 2-D
    # NMDS is ordinal: a monotone transform of the distances must embed
    # (nearly) as well
    res_sqrt = C.nmds(np.sqrt(d), k=2, seed=5)
    assert res_sqrt["stress"] < 0.05
    # cluster structure recovered: within-cluster point distances smaller
    pts = res["points"]
    within = np.linalg.norm(pts[0] - pts[1])
    between = np.linalg.norm(pts[0] - pts[6])
    assert within < between


def test_collect_distance_matrix_bridge(spark):
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.operators.stats import bray_curtis

    rows = [
        ("s1", "a", 10.0), ("s1", "b", 0.0),
        ("s2", "a", 0.0), ("s2", "b", 10.0),
        ("s3", "a", 5.0), ("s3", "b", 5.0),
    ]
    df = spark.createDataFrame(rows, "s string, i string, v double")
    labels, m = C.collect_distance_matrix(bray_curtis(df, "s", "i", "v"))
    assert labels == ["s1", "s2", "s3"]
    assert m[0, 1] == pytest.approx(1.0, abs=1e-6)  # disjoint → BC = 1
    assert m[0, 2] == pytest.approx(0.5, abs=1e-6)
    assert np.allclose(m, m.T)
    assert np.allclose(np.diag(m), 0.0)
    # and the full reference chain: NMDS + ANOSIM on the collected matrix
    res = C.nmds(m, k=2, seed=1, n_starts=2)
    assert res["points"].shape == (3, 2)


def test_ptukey_matches_published_critical_values():
    """alpha=0.05 studentized-range table: q(k=2,df=inf)=2.772,
    q(k=3,df=12)=3.773, q(k=4,df=20)=3.958 — CDF must be 0.95 there."""
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.client import stats as S

    assert abs(S.ptukey(2.772, 2, 100000) - 0.95) < 2e-3
    assert abs(S.ptukey(3.773, 3, 12) - 0.95) < 2e-3
    assert abs(S.ptukey(3.958, 4, 20) - 0.95) < 2e-3
    assert abs(S.qtukey(0.95, 3, 12) - 3.773) < 5e-3
    # CDF sanity: monotone, bounded
    assert S.ptukey(0.5, 3, 12) < S.ptukey(2.0, 3, 12) < S.ptukey(6.0, 3, 12) <= 1.0


def test_tukey_hsd_separated_vs_identical_groups():
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.client import stats as S

    v = [1.0, 2.0, 1.5, 1.2, 1.8, 2.2, 5.0, 5.5, 6.0]
    g = ["a"] * 6 + ["b"] * 3
    (row,) = S.tukey_hsd(v, g)
    assert row["pair"] == "b-a"
    assert row["p_adj"] < 0.001          # clearly separated means
    assert row["lwr"] < row["diff"] < row["upr"]
    assert row["lwr"] > 0                # CI excludes zero
    # same data relabeled into indistinguishable groups -> p near 1
    g2 = ["a", "b"] * 4 + ["a"]
    v2 = [1.0, 1.1, 0.9, 1.0, 1.05, 0.95, 1.0, 1.02, 0.98]
    (row2,) = S.tukey_hsd(v2, g2)
    assert row2["p_adj"] > 0.3           # clearly non-significant
    assert row2["lwr"] < 0 < row2["upr"]  # CI spans zero


def test_kde_cdf_below_closed_forms():
    import numpy as np

    from hannigan_conjunctisviribus_ploscompbio_2017_spark.client import stats as S

    # single point with unit bandwidth: CDF at t is Phi(t - x)
    assert abs(S.kde_cdf_below([0.0], 1.0, bw=1.0) - 0.8413) < 1e-3
    # symmetric sample: mass below 0 ~ 1/2
    rng = np.random.default_rng(0)
    assert abs(S.kde_cdf_below(rng.normal(size=2000), 0.0) - 0.5) < 0.05
    # all observations far above threshold -> ~0 mass
    assert S.kde_cdf_below([10.0, 11.0, 12.0], 0.0) < 1e-6
