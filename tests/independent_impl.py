"""Independent reference implementations for the fixture-oracle entries.

Cross-implementation verification layer (r03 verdict item #1): every
frozen table in eng/oracle_fixtures.py is the engine's OWN sf0.01
output, so the driver's hash check catches drift but not a
wrong-from-birth solver.  The functions here recompute those answers
from the raw parquet with INDEPENDENTLY WRITTEN pandas/numpy/stdlib
code — they import NOTHING from hannigan_conjunctisviribus_ploscompbio_2017_spark (enforced by
tests/test_fixture_independent.py::test_no_engine_imports) — and the
slow-marked tests assert equality with the frozen fixture rows.

Shared primitives replicated from PUBLIC specs:
- XXH64 (Collet's xxHash, public domain spec) — Spark's xxhash64 for a
  multi-column call chains per-field hashes with the running hash as
  seed, starting at 42; integral fields hash as their 4/8-byte
  little-endian forms, doubles as IEEE-754 bit patterns, strings as
  UTF-8 bytes.  Validated bit-for-bit against live Spark in
  test_fixture_independent.py::test_xxh64_matches_spark.
- md5_60: int(md5(s).hexdigest()[:15], 16) — the engine's portable
  60-bit hash family (same formula its DuckDB oracles replay).
- round_half_up: java.math.BigDecimal HALF_UP rounding of the EXACT
  binary double (what Spark's round() does) — python's round() is
  banker's and differs on exact .5 digits.
"""

from __future__ import annotations

import hashlib
import math
import struct
from decimal import ROUND_HALF_UP, Decimal

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 over raw bytes (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            for k, v in enumerate((v1, v2, v3, v4)):
                lane = struct.unpack_from("<Q", data, i + 8 * k)[0]
                v = (v + lane * _P2) & _M
                v = (_rotl(v, 31) * _P1) & _M
                if k == 0:
                    v1 = v
                elif k == 1:
                    v2 = v
                elif k == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            v = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (((h ^ v) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        lane = struct.unpack_from("<Q", data, i)[0]
        k1 = (_rotl((lane * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        lane = struct.unpack_from("<I", data, i)[0]
        h = ((_rotl(h ^ ((lane * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1)) & _M
        i += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*fields) -> int:
    """Replay of Spark's xxhash64(col1, col2, ...) (signed 64-bit):
    running hash starts at 42; each field hashes its canonical byte
    form with the running hash as seed.  Supported field forms:
    - int  → 8-byte little-endian (Spark widens int columns handed to
      hashLong; pass ('i4', v) for a true IntegerType column)
    - ('i4', v) → 4-byte little-endian (IntegerType)
    - float → IEEE-754 bits as 8-byte LE (-0.0 normalized to 0.0)
    - str → UTF-8 bytes
    - list[int] → array<long>: elements chained in order
    """
    h = 42
    for f in fields:
        if isinstance(f, tuple) and f[0] == "i4":
            h = xxh64(struct.pack("<i", f[1]), h)
        elif isinstance(f, bool):
            raise TypeError("bool fields not needed / supported")
        elif isinstance(f, int):
            h = xxh64(struct.pack("<q", f), h)
        elif isinstance(f, float):
            if f == 0.0:
                f = 0.0  # normalize -0.0
            h = xxh64(struct.pack("<d", f), h)
        elif isinstance(f, str):
            h = xxh64(f.encode("utf-8"), h)
        elif isinstance(f, list):
            for el in f:
                h = xxh64(struct.pack("<q", el), h)
        else:
            raise TypeError(f"unsupported field type {type(f)}")
    return _to_signed(h)


def md5_60(s: str) -> int:
    """The engine's portable 60-bit hash: first 15 hex digits of md5."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def round_half_up(x: float, digits: int) -> float:
    """Spark's round(): HALF_UP on the exact binary value of the double
    (java BigDecimal.valueOf uses the shortest decimal repr — Double
    .toString — so quantize Decimal(repr(x)), not Decimal(x))."""
    if x != x or x in (float("inf"), float("-inf")):
        return x
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP))


def seed_for(key: str, base_seed: int) -> int:
    """stats._seed_for replay: first 4 bytes of sha256('{seed}:{key}')."""
    h = hashlib.sha256(f"{base_seed}:{key}".encode()).digest()
    return int.from_bytes(h[:4], "big")


# --------------------------------------------------------------------------
# Graph solvers (independent re-implementations of the kernel specs)
# --------------------------------------------------------------------------


def symmetrize_pairs(edges) -> set[tuple[str, str]]:
    """Undirected edge set: both directions of every input pair."""
    out = set()
    for s, d in edges:
        out.add((str(s), str(d)))
        out.add((str(d), str(s)))
    return out


def brandes_betweenness(directed_pairs, max_depth: int | None = None,
                        pivots=None) -> dict[str, float]:
    """Exact (or pivot-restricted, depth-truncated) Brandes betweenness
    over the SYMMETRIZED graph; undirected halving applied.  Written
    from the published algorithm (Brandes 2001), not from the engine.
    Returns unrounded values for every node that appears as a source in
    the symmetrized edge set."""
    from collections import deque

    adj: dict[str, list[str]] = {}
    for s, d in sorted(symmetrize_pairs(directed_pairs)):
        adj.setdefault(s, []).append(d)
    nodes = list(adj)
    sources = pivots if pivots is not None else nodes
    bc = dict.fromkeys(nodes, 0.0)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        preds: dict[str, list[str]] = {s: []}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            if max_depth is not None and dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    preds[w] = []
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = dict.fromkeys(order, 0.0)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {n: v / 2.0 for n, v in bc.items()}


def alpha_centrality_solve(directed_pairs, alpha: float) -> dict[str, float]:
    """x = (I − αAᵀ)⁻¹·1 over the symmetrized unweighted graph
    (Bonacich alpha centrality, unit exogenous input)."""
    import numpy as np

    und = sorted(symmetrize_pairs(directed_pairs))
    nodes = sorted({n for p in und for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in und:
        A[idx[d], idx[s]] = 1.0
    x = np.linalg.solve(np.eye(n) - alpha * A, np.ones(n))
    return dict(zip(nodes, x.tolist()))


def cnm_greedy_modularity(directed_pairs) -> tuple[dict[str, str], float]:
    """Clauset-Newman-Moore greedy agglomeration on the symmetrized
    unweighted graph.  Spec (matches the engine's documented contract,
    re-implemented from the CNM paper): maintain ΔQ_ij = 2(e_ij −
    a_i·a_j); repeatedly merge the pair with the largest ΔQ, ties
    broken on the lexicographically smallest (i, j); stop when the best
    ΔQ ≤ 1e-15.  Community label = min member node id.  Returns
    (node → community, final modularity Q)."""
    und = {(s, d) for s, d in symmetrize_pairs(directed_pairs)}
    wmap = {(s, d) for s, d in und if s < d}
    nodes = sorted({n for p in und for n in p})
    if not wmap:
        return {n: n for n in nodes}, 0.0
    two_m = 2.0 * len(wmap)
    e: dict[str, dict[str, float]] = {n: {} for n in nodes}
    a: dict[str, float] = {n: 0.0 for n in nodes}
    for s, d in wmap:
        f = 1.0 / two_m
        e[s][d] = e[s].get(d, 0.0) + f
        e[d][s] = e[d].get(s, 0.0) + f
        a[s] += f
        a[d] += f
    members: dict[str, list[str]] = {n: [n] for n in nodes}
    q = -sum(v * v for v in a.values())
    alive = set(nodes)
    while True:
        # full scan each round (independent of the engine's stamped
        # heap): largest ΔQ, ties by smallest (i, j)
        best = None
        for i in sorted(alive):
            for j in sorted(e[i]):
                if i < j:
                    dq = 2.0 * (e[i][j] - a[i] * a[j])
                    if (
                        best is None
                        or dq > best[0]
                        or (dq == best[0] and (i, j) < (best[1], best[2]))
                    ):
                        best = (dq, i, j)
        if best is None or best[0] <= 1e-15:
            break
        dq, i, j = best
        q += dq
        for n_, f in e[j].items():
            if n_ == i:
                continue
            e[i][n_] = e[i].get(n_, 0.0) + f
            e[n_][i] = e[i][n_]
            del e[n_][j]
        e[i].pop(j, None)
        a[i] += a[j]
        members[i].extend(members.pop(j))
        del e[j], a[j]
        alive.discard(j)
    out = {}
    for root, ms in members.items():
        label = min(ms)
        for n_ in ms:
            out[n_] = label
    return out, q


# --------------------------------------------------------------------------
# Weighted-graph kernels for the pipeline replays
# --------------------------------------------------------------------------


def symmetrize_weighted(edges) -> dict[tuple[str, str], float]:
    """Undirected weighted view: both directions, MAX weight per
    directed (src, dst) pair — the engine's deterministic reduce for
    inputs carrying both orientations."""
    out: dict[tuple[str, str], float] = {}
    for s, d, w in edges:
        for k in ((str(s), str(d)), (str(d), str(s))):
            w0 = out.get(k)
            out[k] = float(w) if w0 is None else max(w0, float(w))
    return out


def eigenvector_centrality_py(edges, max_iter: int) -> dict[str, float]:
    """Shifted power iteration (A + sI, s = max weighted degree) with
    per-step L2 normalization, scaled to max = 1 — igraph
    eigen_centrality semantics, re-implemented over plain dicts.
    Returns 6dp-rounded centrality per node."""
    sym = symmetrize_weighted(edges)
    nodes = sorted({s for s, _ in sym})
    wdeg = {n: 0.0 for n in nodes}
    for (s, _), w in sorted(sym.items()):
        wdeg[s] += w
    shift = max(wdeg.values())
    score = {n: 1.0 for n in nodes}
    for _ in range(max_iter):
        ax = {n: 0.0 for n in nodes}
        for (s, d), w in sorted(sym.items()):
            ax[d] += w * score[s]
        raw = {n: ax[n] + shift * score[n] for n in nodes}
        norm = math.sqrt(sum(v * v for v in raw.values()))
        score = {n: v / norm for n, v in raw.items()}
    mx = max(score.values())
    return {n: round_half_up(v / mx, 6) for n, v in score.items()}


def pagerank_py(edges, damping: float = 0.85, max_iter: int = 20) -> dict[str, float]:
    """Weighted PageRank on the undirected max-weight view; 8dp."""
    sym = symmetrize_weighted(edges)
    nodes = sorted({s for s, _ in sym})
    outw = {n: 0.0 for n in nodes}
    for (s, _), w in sorted(sym.items()):
        outw[s] += w
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(max_iter):
        inc = {v: 0.0 for v in nodes}
        for (s, d), w in sorted(sym.items()):
            inc[d] += (w / outw[s]) * rank[s]
        rank = {v: (1 - damping) / n + damping * inc[v] for v in nodes}
    return {v: round_half_up(r, 8) for v, r in rank.items()}


def alpha_centrality_weighted_py(
    edges, alpha: float, cap_alpha: bool = False
) -> dict[str, float]:
    """Weighted (I − αAᵀ)⁻¹·1 per the engine's contract: A over the
    symmetrized max-weight view, optional per-graph Gershgorin clamp
    α ← min(α, 0.5/max row-sum |A|).  6dp."""
    import numpy as np

    sym = symmetrize_weighted(edges)
    nodes = sorted({n for p in sym for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for (s, d), w in sym.items():
        A[idx[d], idx[s]] = w
    a_eff = alpha
    if cap_alpha:
        row_sum = np.abs(A).sum(axis=1).max()
        if row_sum > 0:
            a_eff = min(alpha, 0.5 / float(row_sum))
    x = np.linalg.solve(np.eye(n) - a_eff * A, np.ones(n))
    return {v: round_half_up(float(xi), 6) for v, xi in zip(nodes, x)}


def node_entropy_py(sym_weighted: dict[tuple[str, str], float]) -> dict[str, float]:
    """Shannon diversity of each node's incident edge weights over an
    ALREADY-symmetrized weighted view: H = ln(W) − (Σ w·ln w)/W.  6dp."""
    tot: dict[str, float] = {}
    wlnw: dict[str, float] = {}
    for (s, _), w in sorted(sym_weighted.items()):
        tot[s] = tot.get(s, 0.0) + w
        wlnw[s] = wlnw.get(s, 0.0) + w * math.log(w)
    return {
        n: round_half_up(math.log(tot[n]) - wlnw[n] / tot[n], 6) for n in tot
    }


def bray_curtis_py(rows) -> dict[tuple[str, str], float]:
    """Pairwise Bray-Curtis over (sample, item, value) rows: ALL sample
    pairs a<b (pairs sharing nothing get BC=1).  6dp."""
    by_sample: dict[str, dict[str, float]] = {}
    for s, i, v in rows:
        by_sample.setdefault(str(s), {})[str(i)] = float(v)
    samples = sorted(by_sample)
    totals = {s: sum(by_sample[s].values()) for s in samples}
    out = {}
    for ai in range(len(samples)):
        for bi in range(ai + 1, len(samples)):
            a, b = samples[ai], samples[bi]
            shared = set(by_sample[a]) & set(by_sample[b])
            msum = sum(min(by_sample[a][i], by_sample[b][i]) for i in sorted(shared))
            out[(a, b)] = round_half_up(
                1.0 - 2.0 * msum / (totals[a] + totals[b]), 6
            )
    return out


def centralization_py(values) -> float:
    """Freeman centralization (n·max − Σ)/(n−1); 0 for n ≤ 1.  6dp."""
    vals = list(values)
    n = len(vals)
    if n <= 1:
        return 0.0
    return round_half_up((n * max(vals) - sum(vals)) / (n - 1), 6)


def truncated_bfs_ecc(directed_pairs, roots, max_depth: int) -> dict[str, int]:
    """Per-root eccentricity from a depth-capped BFS over the
    symmetrized graph (landmark diameter/radius lower/upper bounds)."""
    from collections import deque

    adj: dict[str, list[str]] = {}
    for s, d in sorted(symmetrize_pairs(directed_pairs)):
        adj.setdefault(s, []).append(d)
    out = {}
    for r in roots:
        dist = {r: 0}
        q = deque([r])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        out[r] = max(dist.values())
    return out


def degrees_py(directed_pairs) -> dict[str, int]:
    """Undirected node degree (self-loops count 2, igraph semantics)."""
    out: dict[str, int] = {}
    for s, d in symmetrize_pairs(directed_pairs):
        out[s] = out.get(s, 0) + (2 if s == d else 1)
    return out


def graph_size_py(directed_pairs) -> tuple[int, int]:
    """(n_nodes, n_edges) of the undirected view, each edge once."""
    sym = symmetrize_pairs(directed_pairs)
    nodes = {s for s, _ in sym}
    loops = sum(1 for s, d in sym if s == d)
    return len(nodes), (len(sym) + loops) // 2


def stddev_pop(vals) -> float:
    m = sum(vals) / len(vals)
    return math.sqrt(sum((v - m) ** 2 for v in vals) / len(vals))


def rarefy_py(items_counts, depth: int, sample_key: str, seed: int = 42):
    """vegan::rrarefy replay: canonical item order (string sort), RNG
    seeded sha256('{seed}:{sample}'), one multivariate-hypergeometric
    draw.  Returns {item: kept_count > 0}."""
    import numpy as np

    items_counts = sorted(items_counts, key=lambda t: t[0])
    counts = np.array([c for _, c in items_counts], dtype=np.int64)
    rng = np.random.default_rng(seed_for(sample_key, seed))
    kept = rng.multivariate_hypergeometric(counts, depth)
    return {
        i: int(k) for (i, _), k in zip(items_counts, kept) if k > 0
    }


# --------------------------------------------------------------------------
# ML curve/count math from frozen per-row scores (no MLlib anywhere)
# --------------------------------------------------------------------------


def roc_points_py(scored, round_to: int = 6):
    """ROC points from (gold, score) rows — the pROC::roc construction
    the reference plots (bin/CalculatePredModel.R:302-313) and
    ml/model.roc_from_scores implements distributed: distinct
    thresholds DESCENDING, cumulative FPR/TPR with ties grouped, an
    (inf, 0, 0) anchor, fpr/tpr HALF_UP-rounded like Spark's round().
    Returns [(threshold, fpr, tpr), ...]."""
    pos: dict[float, int] = {}
    neg: dict[float, int] = {}
    npos = nneg = 0
    for gold, s in scored:
        if gold:
            pos[s] = pos.get(s, 0) + 1
            npos += 1
        else:
            neg[s] = neg.get(s, 0) + 1
            nneg += 1
    pts = [(float("inf"), 0.0, 0.0)]
    cp = cn = 0
    for t in sorted(set(pos) | set(neg), reverse=True):
        cp += pos.get(t, 0)
        cn += neg.get(t, 0)
        pts.append(
            (t, round_half_up(cn / nneg, round_to), round_half_up(cp / npos, round_to))
        )
    return pts


def auc_trapezoid_py(scored) -> float:
    """areaUnderROC from (gold, score) rows: trapezoid over the exact
    (unrounded) cumulative curve — MLlib's definition with no curve
    downsampling (BinaryClassificationMetrics numBins=0)."""
    pos: dict[float, int] = {}
    neg: dict[float, int] = {}
    npos = nneg = 0
    for gold, s in scored:
        if gold:
            pos[s] = pos.get(s, 0) + 1
            npos += 1
        else:
            neg[s] = neg.get(s, 0) + 1
            nneg += 1
    auc = 0.0
    px = py = 0.0
    cp = cn = 0
    for t in sorted(set(pos) | set(neg), reverse=True):
        cp += pos.get(t, 0)
        cn += neg.get(t, 0)
        x, y = cn / nneg, cp / npos
        auc += (x - px) * (y + py) / 2.0
        px, py = x, y
    return auc


def confusion_py(scored) -> dict[tuple[str, int], int]:
    """Confusion counts from (gold, score) rows under MLlib's argmax
    prediction rule for binary RF: predict class 1 iff P(1) > 0.5 (an
    exact 0.5 tie argmaxes to class 0).  Keys are the engine's
    (prediction label, gold) pairs."""
    out: dict[tuple[str, int], int] = {}
    for gold, s in scored:
        label = "Interacts" if s > 0.5 else "NotInteracts"
        out[(label, gold)] = out.get((label, gold), 0) + 1
    return out


# ---------------------------------------------------------------------------
# Second RF implementation (r05 verdict ask #3): a small, deterministic,
# numpy-only decision forest with the reference model's hyperparameter
# semantics (bin/CalculatePredModel.R:47-57 via MLlib defaults: bootstrap
# bagging, gini impurity, sqrt-mtry feature subsampling, bounded depth).
# It is NOT a re-derivation of MLlib's exact trees (different RNG streams,
# exact thresholds instead of MLlib's binned candidates) — it is an
# INDEPENDENT forest trained on the same rows, used to pin the engine
# model's held-out AUC inside a parity band.  A wrong engine fit (labels
# permuted, features scrambled, split leaking train into test) moves the
# frozen AUC far outside the band; two honest forests on the same data
# land together.
# ---------------------------------------------------------------------------


def _gini_best_split(X, y, feat_idx):
    """Best (feature, threshold) over feat_idx by weighted child gini;
    candidate thresholds are midpoints between consecutive distinct
    sorted values (exact search).  Deterministic tie-break: first
    feature in feat_idx order wins strict improvements only.  Returns
    (feature, threshold) or None when no feature admits a split."""
    import numpy as _np

    n = len(y)
    total_pos = float(y.sum())
    best = None  # (weighted_gini, feature, threshold)
    for f in feat_idx:
        order = _np.argsort(X[:, f], kind="mergesort")
        xs = X[order, f]
        ys = y[order]
        cut = _np.nonzero(xs[1:] != xs[:-1])[0]
        if cut.size == 0:
            continue
        nl = (cut + 1).astype(float)
        pl = _np.cumsum(ys)[cut].astype(float)
        nr = n - nl
        pr = total_pos - pl
        gl = 1.0 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
        gr = 1.0 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
        w = (nl * gl + nr * gr) / n
        j = int(_np.argmin(w))
        thr = (xs[cut[j]] + xs[cut[j] + 1]) / 2.0
        if best is None or w[j] < best[0] - 1e-15:
            best = (float(w[j]), int(f), float(thr))
    return None if best is None else (best[1], best[2])


def _tree_build(X, y, rng, max_depth, mtry, depth=0):
    """Recursive gini tree: ('leaf', p1) | ('split', f, thr, lo, hi).
    mtry features drawn per NODE (caret/randomForest semantics; MLlib
    draws per node too).  Leaf value = class-1 fraction."""
    n = len(y)
    pos = float(y.sum())
    if depth >= max_depth or n < 2 or pos == 0.0 or pos == n:
        return ("leaf", pos / n)
    feat_idx = sorted(rng.choice(X.shape[1], size=min(mtry, X.shape[1]), replace=False))
    found = _gini_best_split(X, y, feat_idx)
    if found is None:
        # fall back to the full feature set before declaring a leaf so a
        # constant sampled pair doesn't truncate an impure node
        found = _gini_best_split(X, y, range(X.shape[1]))
        if found is None:
            return ("leaf", pos / n)
    f, thr = found
    mask = X[:, f] <= thr
    return (
        "split",
        f,
        thr,
        _tree_build(X[mask], y[mask], rng, max_depth, mtry, depth + 1),
        _tree_build(X[~mask], y[~mask], rng, max_depth, mtry, depth + 1),
    )


def rf_train_py(X, y, n_trees=20, max_depth=5, mtry=2, seed=42):
    """Deterministic numpy random forest: seeded bootstrap per tree
    (sampling with replacement, MLlib subsamplingRate=1.0 semantics),
    per-node sqrt-mtry feature draws, gini splits, depth bound."""
    import numpy as _np

    rng = _np.random.RandomState(seed)
    X = _np.asarray(X, dtype=float)
    y = _np.asarray(y, dtype=float)
    n = len(y)
    trees = []
    for _t in range(n_trees):
        idx = rng.randint(0, n, n)
        trees.append(_tree_build(X[idx], y[idx], rng, max_depth, mtry))
    return trees


def rf_predict_py(trees, X):
    """P(class 1) per row: mean of the trees' leaf class-1 fractions
    (MLlib averages per-tree leaf distributions the same way)."""
    import numpy as _np

    X = _np.asarray(X, dtype=float)
    out = _np.zeros(len(X), dtype=float)

    def walk(node, mask, acc):
        if node[0] == "leaf":
            acc[mask] += node[1]
            return
        _tag, f, thr, lo, hi = node
        m_lo = mask & (X[:, f] <= thr)
        walk(lo, m_lo, acc)
        walk(hi, mask & ~m_lo, acc)

    for tree in trees:
        walk(tree, _np.ones(len(X), dtype=bool), out)
    return out / len(trees)
