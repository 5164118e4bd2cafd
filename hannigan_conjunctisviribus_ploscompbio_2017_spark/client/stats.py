"""Driver-side ordination & hypothesis tests (M3/M5/M6) — numpy only.

The reference finishes its pipelines with R statistics over small
collected tables:

- NMDS ordination: bin/interpersonaldiversity.R:177-182,
  bin/CompareSkin.R:298-302 (vegan::metaMDS on the Bray-Curtis matrix)
- paired Wilcoxon: bin/interpersonaldiversity.R:147,422,460,602
- pairwise Wilcoxon: bin/CompareSkin.R:218,247,266
- Kruskal-Wallis + kruskalmc posthoc: bin/CompareSkin.R (kruskalmc)
- ANOSIM: bin/interpersonaldiversity.R:194, bin/CompareSkin.R:336
- betadisper + permutest: bin/CompareSkin.R:346-423

These are CLIENT-SIDE by design (SURVEY §2.1 scopes M3/M5/M6 out of the
engine): the distributed part — building the S×S distance structure from
millions of rows — is operators.stats.bray_curtis; the S×S matrix itself
is tiny and collected here. No scipy/sklearn in the runtime, so the
special functions are implemented directly:

- normal survival via math.erfc;
- χ² survival via the regularized upper incomplete gamma
  (series / continued-fraction, Numerical Recipes §6.2 scheme);
- inverse normal CDF via the Acklam rational approximation
  (|rel err| < 1.15e-9), used for kruskalmc critical differences;
- NMDS as Kruskal stress-1 nonmetric MDS: SMACOF/Guttman majorization
  with pool-adjacent-violators (PAVA) isotonic regression, PCoA init.

p-values from rank tests use the normal/χ² approximations with tie
corrections and continuity corrections matching R's defaults
(wilcox.test correct=TRUE); exact small-n enumeration is not
implemented — for n < ~10 treat p as approximate.
"""

from __future__ import annotations

import math

import numpy as np


# numpy renamed trapz -> trapezoid in 2.0 (trapz removed); support both
_trapezoid = getattr(np, "trapezoid", None) or np.trapz

# --------------------------------------------------------------------------
# special functions (no scipy in the runtime)
# --------------------------------------------------------------------------


def normal_sf(z: float) -> float:
    """Standard normal survival function P(Z > z)."""
    return 0.5 * math.erfc(z / math.sqrt(2.0))


def _gamma_p(a: float, x: float) -> float:
    """Regularized lower incomplete gamma P(a, x)."""
    if x < 0 or a <= 0:
        raise ValueError("gamma_p requires x >= 0, a > 0")
    if x == 0:
        return 0.0
    lg = math.lgamma(a)
    if x < a + 1.0:
        # series representation
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        return total * math.exp(-x + a * math.log(x) - lg)
    # continued fraction for Q(a, x), Lentz's algorithm
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-15:
            break
    q = math.exp(-x + a * math.log(x) - lg) * h
    return 1.0 - q


def chi2_sf(stat: float, df: int) -> float:
    """χ² survival function P(X > stat) with df degrees of freedom."""
    if stat <= 0:
        return 1.0
    return max(0.0, min(1.0, 1.0 - _gamma_p(df / 2.0, stat / 2.0)))


def _normal_ppf(p: float) -> float:
    """Inverse standard normal CDF (Acklam's rational approximation)."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def _rank_with_ties(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Average ranks (1-based) and tie-group sizes."""
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(len(v), dtype=float)
    sv = v[order]
    ties = []
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        ranks[order[i:j + 1]] = avg
        if j > i:
            ties.append(j - i + 1)
        i = j + 1
    return ranks, np.array(ties, dtype=float)


# --------------------------------------------------------------------------
# M5 — Wilcoxon family / Kruskal-Wallis
# --------------------------------------------------------------------------


def wilcoxon_signed_rank(x, y) -> dict:
    """Paired Wilcoxon signed-rank test (wilcox.test(..., paired=TRUE),
    bin/interpersonaldiversity.R:147). Normal approximation with tie
    correction and continuity correction (R's default for n > 50 or
    ties). Returns {statistic, p_value, n}."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    if x.shape != y.shape:
        raise ValueError("paired test needs equal-length vectors")
    d = x - y
    d = d[d != 0.0]
    n = len(d)
    if n == 0:
        return {"statistic": 0.0, "p_value": 1.0, "n": 0}
    r, ties = _rank_with_ties(np.abs(d))
    w_pos = float(r[d > 0].sum())
    mean = n * (n + 1) / 4.0
    var = n * (n + 1) * (2 * n + 1) / 24.0
    if len(ties):
        var -= float((ties ** 3 - ties).sum()) / 48.0
    if var <= 0:
        return {"statistic": w_pos, "p_value": 1.0, "n": n}
    z = (w_pos - mean - 0.5 * float(np.sign(w_pos - mean))) / math.sqrt(var)
    return {"statistic": w_pos, "p_value": min(1.0, 2 * normal_sf(abs(z))), "n": n}


def mann_whitney_u(x, y) -> dict:
    """Two-sample Wilcoxon rank-sum / Mann-Whitney U
    (wilcox.test(x, y), pairwise use at bin/CompareSkin.R:218).
    Normal approximation, tie + continuity corrected.
    Returns {statistic (U of x), p_value, n1, n2}."""
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    n1, n2 = len(x), len(y)
    if n1 == 0 or n2 == 0:
        raise ValueError("both groups must be non-empty")
    allv = np.concatenate([x, y])
    r, ties = _rank_with_ties(allv)
    r1 = float(r[:n1].sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mean = n1 * n2 / 2.0
    nt = n1 + n2
    var = n1 * n2 * (nt + 1) / 12.0
    if len(ties):
        var -= n1 * n2 * float((ties ** 3 - ties).sum()) / (12.0 * nt * (nt - 1))
    if var <= 0:
        return {"statistic": u1, "p_value": 1.0, "n1": n1, "n2": n2}
    z = (u1 - mean - 0.5 * float(np.sign(u1 - mean))) / math.sqrt(var)
    return {
        "statistic": u1,
        "p_value": min(1.0, 2 * normal_sf(abs(z))),
        "n1": n1,
        "n2": n2,
    }


def pairwise_wilcox(values, groups, p_adjust: str = "holm") -> list[dict]:
    """All-pairs rank-sum tests with Holm correction —
    pairwise.wilcox.test (bin/CompareSkin.R:218,247,266).
    Returns [{group_a, group_b, p_value, p_adjusted}] sorted by pair."""
    values = np.asarray(values, dtype=float)
    groups = np.asarray(groups)
    levels = sorted(set(groups.tolist()))
    pairs = [(a, b) for i, a in enumerate(levels) for b in levels[i + 1:]]
    raw = []
    for a, b in pairs:
        res = mann_whitney_u(values[groups == a], values[groups == b])
        raw.append({"group_a": a, "group_b": b, "p_value": res["p_value"]})
    if p_adjust == "holm":
        m = len(raw)
        order = sorted(range(m), key=lambda i: raw[i]["p_value"])
        running = 0.0
        for k, i in enumerate(order):
            adj = min(1.0, (m - k) * raw[i]["p_value"])
            running = max(running, adj)  # enforce monotonicity
            raw[i]["p_adjusted"] = running
    elif p_adjust == "none":
        for rrow in raw:
            rrow["p_adjusted"] = rrow["p_value"]
    else:
        raise ValueError(f"unknown p_adjust {p_adjust!r}")
    return raw


def kruskal_wallis(values, groups) -> dict:
    """Kruskal-Wallis rank-sum test (kruskal.test; precedes kruskalmc in
    the reference's skin comparisons). Tie-corrected H, χ² p-value.
    Returns {statistic, df, p_value}."""
    values = np.asarray(values, dtype=float)
    groups = np.asarray(groups)
    levels = sorted(set(groups.tolist()))
    k = len(levels)
    if k < 2:
        raise ValueError("need >= 2 groups")
    n = len(values)
    r, ties = _rank_with_ties(values)
    h = 0.0
    for lev in levels:
        rj = r[groups == lev]
        h += rj.sum() ** 2 / len(rj)
    h = 12.0 / (n * (n + 1)) * h - 3.0 * (n + 1)
    if len(ties):
        corr = 1.0 - float((ties ** 3 - ties).sum()) / (n ** 3 - n)
        if corr > 0:
            h /= corr
    return {"statistic": h, "df": k - 1, "p_value": chi2_sf(h, k - 1)}


def kruskalmc(values, groups, alpha: float = 0.05) -> list[dict]:
    """Multiple-comparison test after Kruskal-Wallis (pgirmess::kruskalmc,
    the reference's posthoc for skin-site differences): compare each
    pair's |mean rank difference| against the Bonferroni-adjusted normal
    critical difference z_{1-α/(k(k-1))}·sqrt(N(N+1)/12·(1/ni+1/nj)).
    Returns [{group_a, group_b, obs_dif, critical_dif, significant}]."""
    values = np.asarray(values, dtype=float)
    groups = np.asarray(groups)
    levels = sorted(set(groups.tolist()))
    k = len(levels)
    n = len(values)
    r, _ = _rank_with_ties(values)
    mean_rank = {lev: float(r[groups == lev].mean()) for lev in levels}
    sizes = {lev: int((groups == lev).sum()) for lev in levels}
    zcrit = _normal_ppf(1.0 - alpha / (k * (k - 1)))
    out = []
    for i, a in enumerate(levels):
        for b in levels[i + 1:]:
            obs = abs(mean_rank[a] - mean_rank[b])
            crit = zcrit * math.sqrt(
                n * (n + 1) / 12.0 * (1.0 / sizes[a] + 1.0 / sizes[b])
            )
            out.append(
                {
                    "group_a": a,
                    "group_b": b,
                    "obs_dif": obs,
                    "critical_dif": crit,
                    "significant": obs > crit,
                }
            )
    return out


# --------------------------------------------------------------------------
# distance-matrix bridge + M6 (ANOSIM / betadisper) + M3 (PCoA / NMDS)
# --------------------------------------------------------------------------


def collect_distance_matrix(
    dist_df,
    a_col: str = "sample_a",
    b_col: str = "sample_b",
    value_col: str = "bray_curtis",
) -> tuple[list[str], np.ndarray]:
    """THE scale boundary: collect operators.stats.bray_curtis long-form
    output (S·(S−1)/2 rows) into a symmetric S×S numpy matrix. Only the
    pairwise-distance table crosses the driver — never the underlying
    abundance data. Returns (sorted labels, matrix)."""
    rows = dist_df.select(a_col, b_col, value_col).collect()
    labels = sorted({str(r[a_col]) for r in rows} | {str(r[b_col]) for r in rows})
    idx = {s: i for i, s in enumerate(labels)}
    m = np.zeros((len(labels), len(labels)))
    for r in rows:
        i, j = idx[str(r[a_col])], idx[str(r[b_col])]
        m[i, j] = m[j, i] = float(r[value_col])
    return labels, m


def anosim(dist: np.ndarray, grouping, n_perm: int = 999, seed: int = 42) -> dict:
    """ANOSIM (vegan::anosim, bin/interpersonaldiversity.R:194,
    bin/CompareSkin.R:336): R = (mean between-group rank − mean
    within-group rank) / (M/2) over the ranked distances, permutation
    p-value. Returns {statistic, p_value, n_perm}."""
    grouping = np.asarray(grouping)
    n = dist.shape[0]
    iu = np.triu_indices(n, k=1)
    d = dist[iu]
    ranks, _ = _rank_with_ties(d)
    m = len(d)

    def r_stat(g: np.ndarray) -> float:
        within = g[iu[0]] == g[iu[1]]
        rb = ranks[~within].mean() if (~within).any() else 0.0
        rw = ranks[within].mean() if within.any() else 0.0
        return (rb - rw) / (m / 2.0)

    observed = r_stat(grouping)
    rng = np.random.default_rng(seed)
    exceed = 0
    for _ in range(n_perm):
        if r_stat(rng.permutation(grouping)) >= observed:
            exceed += 1
    return {
        "statistic": observed,
        "p_value": (exceed + 1) / (n_perm + 1),
        "n_perm": n_perm,
    }


def pcoa(dist: np.ndarray, k: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Principal coordinates analysis (classical MDS): Gower-center
    −D²/2, eigendecompose, return (coords n×k over positive eigenvalues,
    all eigenvalues desc)."""
    n = dist.shape[0]
    d2 = dist ** 2
    j = np.eye(n) - np.ones((n, n)) / n
    b = -0.5 * j @ d2 @ j
    vals, vecs = np.linalg.eigh((b + b.T) / 2.0)
    order = np.argsort(vals)[::-1]
    vals, vecs = vals[order], vecs[:, order]
    coords = np.zeros((n, k))
    for i in range(min(k, n)):
        if vals[i] > 1e-12:
            coords[:, i] = vecs[:, i] * math.sqrt(vals[i])
    return coords, vals


def betadisper(
    dist: np.ndarray, grouping, n_perm: int = 999, seed: int = 42
) -> dict:
    """Multivariate homogeneity of group dispersions
    (vegan::betadisper + permutest, bin/CompareSkin.R:346-423): embed by
    PCoA keeping ALL axes, compute each sample's distance to its group
    centroid (vegan's real/imaginary split: squared distance = d² in
    positive-eigenvalue space − d² in negative space, clamped at 0),
    then a one-way F statistic on those distances with a permutation
    p-value. Returns {f_statistic, p_value, distances, n_perm}."""
    grouping = np.asarray(grouping)
    n = dist.shape[0]
    d2 = dist ** 2
    j = np.eye(n) - np.ones((n, n)) / n
    b = -0.5 * j @ d2 @ j
    vals, vecs = np.linalg.eigh((b + b.T) / 2.0)
    pos = vals > 1e-12
    neg = vals < -1e-12
    xp = vecs[:, pos] * np.sqrt(vals[pos])
    xn = vecs[:, neg] * np.sqrt(-vals[neg])

    def centroid_dists(g: np.ndarray) -> np.ndarray:
        z = np.zeros(n)
        for lev in set(g.tolist()):
            mask = g == lev
            cp = xp[mask].mean(axis=0) if xp.size else np.zeros(0)
            cn = xn[mask].mean(axis=0) if xn.size else np.zeros(0)
            dp = ((xp[mask] - cp) ** 2).sum(axis=1) if xp.size else 0.0
            dn = ((xn[mask] - cn) ** 2).sum(axis=1) if xn.size else 0.0
            z[mask] = np.sqrt(np.maximum(dp - dn, 0.0))
        return z

    def f_stat(z: np.ndarray, g: np.ndarray) -> float:
        levels = sorted(set(g.tolist()))
        grand = z.mean()
        ssb = sum(
            (g == lev).sum() * (z[g == lev].mean() - grand) ** 2 for lev in levels
        )
        ssw = sum(((z[g == lev] - z[g == lev].mean()) ** 2).sum() for lev in levels)
        dfb, dfw = len(levels) - 1, n - len(levels)
        if ssw <= 1e-30 or dfb == 0 or dfw == 0:
            return 0.0
        return (ssb / dfb) / (ssw / dfw)

    z_obs = centroid_dists(grouping)
    observed = f_stat(z_obs, grouping)
    # permutest.betadisper: permute which distance-to-centroid values
    # carry which label (the distances are recomputed per permutation in
    # vegan's model="direct"; permuting z is the classic approximation)
    rng = np.random.default_rng(seed)
    exceed = 0
    for _ in range(n_perm):
        if f_stat(z_obs, rng.permutation(grouping)) >= observed:
            exceed += 1
    return {
        "f_statistic": observed,
        "p_value": (exceed + 1) / (n_perm + 1),
        "distances": z_obs,
        "n_perm": n_perm,
    }


def _pava(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators: weighted isotonic (non-decreasing) fit."""
    y = y.astype(float).copy()
    w = w.astype(float).copy()
    # blocks as (value, weight, count) merged left-to-right
    vals: list[float] = []
    wts: list[float] = []
    cnt: list[int] = []
    for yi, wi in zip(y, w):
        vals.append(yi)
        wts.append(wi)
        cnt.append(1)
        while len(vals) > 1 and vals[-2] > vals[-1]:
            v = (vals[-2] * wts[-2] + vals[-1] * wts[-1]) / (wts[-2] + wts[-1])
            wts[-2] += wts[-1]
            cnt[-2] += cnt[-1]
            vals[-2] = v
            vals.pop()
            wts.pop()
            cnt.pop()
    out = np.empty(len(y))
    pos = 0
    for v, c in zip(vals, cnt):
        out[pos:pos + c] = v
        pos += c
    return out


def nmds(
    dist: np.ndarray,
    k: int = 2,
    max_iter: int = 200,
    tol: float = 1e-7,
    seed: int = 42,
    n_starts: int = 4,
) -> dict:
    """Nonmetric MDS (vegan::metaMDS analog,
    bin/interpersonaldiversity.R:177-182, bin/CompareSkin.R:298-302):
    minimize Kruskal stress-1 by alternating PAVA isotonic regression of
    the configuration distances on the dissimilarity ranks with a
    Guttman-transform (SMACOF) update. PCoA init plus `n_starts−1`
    seeded random restarts (metaMDS trymax analog); best stress wins.
    Returns {points (n×k), stress, converged}."""
    n = dist.shape[0]
    iu = np.triu_indices(n, k=1)
    dvec = dist[iu]
    order = np.argsort(dvec, kind="mergesort")
    rng = np.random.default_rng(seed)

    def run(x0: np.ndarray) -> tuple[np.ndarray, float, bool]:
        x = x0.copy()
        last = np.inf
        converged = False
        for _ in range(max_iter):
            diff = x[iu[0]] - x[iu[1]]
            d = np.sqrt((diff ** 2).sum(axis=1))
            d = np.maximum(d, 1e-12)
            dhat = np.empty_like(d)
            dhat[order] = _pava(d[order], np.ones(len(d)))
            num = ((d - dhat) ** 2).sum()
            den = (d ** 2).sum()
            stress = math.sqrt(num / den) if den > 0 else 0.0
            if abs(last - stress) < tol:
                converged = True
                break
            last = stress
            # Guttman transform with b-matrix weights dhat/d
            ratio = dhat / d
            bmat = np.zeros((n, n))
            bmat[iu[0], iu[1]] = -ratio
            bmat[iu[1], iu[0]] = -ratio
            np.fill_diagonal(bmat, -bmat.sum(axis=1))
            x = bmat @ x / n
        return x, last if last != np.inf else stress, converged

    starts = [pcoa(dist, k)[0]]
    scale = max(dvec.max(), 1e-9)
    for _ in range(max(0, n_starts - 1)):
        starts.append(rng.normal(scale=scale, size=(n, k)))
    best = None
    for x0 in starts:
        x, stress, conv = run(x0)
        if best is None or stress < best[1]:
            best = (x, stress, conv)
    x, stress, conv = best
    x = x - x.mean(axis=0)  # center for a canonical-ish output
    return {"points": x, "stress": stress, "converged": conv}


# --------------------------------------------------------------------------
# M6: kernel-density CDF mass + Tukey HSD post-hoc
# --------------------------------------------------------------------------


def kde_cdf_below(x, threshold: float = 0.0, bw: float | None = None) -> float:
    """The reference's density() → approxfun → integrate(-Inf, t)
    pattern (bin/interpersonaldiversity.R:141-145): the probability mass
    below `threshold` under a Gaussian kernel density estimate of x.

    For a Gaussian kernel the CDF has the closed form
    mean(Phi((t - x_i)/h)), so this evaluates the integral exactly —
    no grid/approxfun discretization error. Bandwidth defaults to R's
    bw.nrd0 (0.9 · min(sd, IQR/1.34) · n^(-1/5))."""
    x = np.asarray(x, dtype=float)
    n = x.size
    if n == 0:
        raise ValueError("kde_cdf_below requires at least one observation")
    if bw is None:
        sd = x.std(ddof=1) if n > 1 else 0.0
        q75, q25 = np.percentile(x, [75, 25])
        sig = min(sd, (q75 - q25) / 1.34) if (q75 > q25 and sd > 0) else sd
        if sig <= 0:
            sig = abs(x[0]) or 1.0
        bw = 0.9 * sig * n ** (-0.2)
    return float(
        np.mean([1.0 - normal_sf((threshold - xi) / bw) for xi in x])
    )


def ptukey(q: float, k: int, df: int) -> float:
    """Studentized range CDF P(Q <= q) for k group means and df error
    degrees of freedom, by direct quadrature of

        P = ∫ f_s(s) · k ∫ φ(z) [Φ(z) − Φ(z − q·s)]^(k−1) dz ds

    with s = χ_df/√df (the scaled error-SD factor). The z-grid is
    0.01-spaced over ±8 and the s-grid tracks the chi concentration
    1 ± 10/√(2·df); absolute accuracy ~1e-4 — the same quadrature
    family R's ptukey uses. Backs TukeyHSD (bin/CompareSkin.R:349,375,
    402, bin/compareTwins.R:261)."""
    if q <= 0:
        return 0.0
    if k < 2:
        raise ValueError("ptukey requires k >= 2")
    zs = np.linspace(-8.0, 8.0, 1601)
    phi = np.exp(-(zs ** 2) / 2.0) / math.sqrt(2.0 * math.pi)
    big_phi = np.array([1.0 - normal_sf(z) for z in zs])

    def inner(u: float) -> float:
        shifted = np.interp(zs - u, zs, big_phi, left=0.0, right=1.0)
        integrand = phi * np.clip(big_phi - shifted, 0.0, 1.0) ** (k - 1)
        return float(k * _trapezoid(integrand, zs))

    if df > 5000:  # s collapses to 1: the infinite-df range distribution
        return min(1.0, inner(q))
    lo = max(1e-4, 1.0 - 10.0 / math.sqrt(2.0 * df))
    hi = 1.0 + 12.0 / math.sqrt(2.0 * df)
    ss = np.linspace(lo, hi, 400)
    log_fs = (
        (df / 2.0) * math.log(df)
        - (df / 2.0 - 1.0) * math.log(2.0)
        - math.lgamma(df / 2.0)
        + (df - 1.0) * np.log(ss)
        - df * ss ** 2 / 2.0
    )
    fs = np.exp(log_fs)
    vals = np.array([inner(q * s) for s in ss])
    return float(min(1.0, _trapezoid(fs * vals, ss)))


def qtukey(p: float, k: int, df: int, tol: float = 1e-4) -> float:
    """Studentized range quantile (inverse of ptukey) by bisection."""
    lo, hi = 0.0, 2.0
    while ptukey(hi, k, df) < p:
        hi *= 2.0
        if hi > 1e3:
            raise ValueError("qtukey failed to bracket")
    while hi - lo > tol:
        mid = (lo + hi) / 2.0
        if ptukey(mid, k, df) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def tukey_hsd(values, groups, conf: float = 0.95) -> list[dict]:
    """TukeyHSD(aov(values ~ groups)) (bin/CompareSkin.R:349,375,402,
    bin/compareTwins.R:261 run it on the betadisper model): all pairwise
    group-mean differences with studentized-range-adjusted p-values and
    simultaneous confidence intervals (Tukey-Kramer unequal-n form).

    Returns one dict per pair (R's "lev2-lev1" order):
    {pair, diff, lwr, upr, p_adj}."""
    v = np.asarray(values, dtype=float)
    g = np.asarray(groups)
    levels = sorted(set(g.tolist()))
    k, n = len(levels), v.size
    if k < 2 or n <= k:
        raise ValueError("tukey_hsd needs >= 2 groups and residual df > 0")
    df = n - k
    mse = sum(((v[g == lev] - v[g == lev].mean()) ** 2).sum() for lev in levels) / df
    qcrit = qtukey(conf, k, df)
    out = []
    for i in range(k):
        for j in range(i + 1, k):
            a, b = levels[i], levels[j]
            na, nb = int((g == a).sum()), int((g == b).sum())
            diff = float(v[g == b].mean() - v[g == a].mean())
            se = math.sqrt(mse / 2.0 * (1.0 / na + 1.0 / nb))
            q_obs = abs(diff) / se if se > 0 else float("inf")
            out.append(
                {
                    "pair": f"{b}-{a}",
                    "diff": diff,
                    "lwr": diff - qcrit * se,
                    "upr": diff + qcrit * se,
                    "p_adj": max(0.0, 1.0 - ptukey(q_obs, k, df)),
                }
            )
    return out
