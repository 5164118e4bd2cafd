"""Same-window bench replay: the honest cross-round perf artifact.

This box's wall clock drifts 1.1-1.8x hour-to-hour in an I/O/scheduling
class the bench's pure-CPU calibration cannot see (the r09 episode), so
two raw BENCH_r{N}.json totals from different rounds — therefore
different windows — do not support any code-level perf claim.  Rounds
r09-r11 adjudicated this with ad-hoc interleaved A/Bs written up in
COVERAGE.md prose; the r11 verdict (nit #2 / ask #4) asked for the
replay to be a MACHINE-READABLE artifact committed next to the drifted
raw series.  This tool is that:

    python tools/bench_replay.py <baseline_ref> <round> [n_interleaves]

checks the baseline ref out into a cached git worktree
(/tmp/sg_replay_<sha>), then alternates FULL bench.py runs between the
current tree and the baseline tree in one session window —
current, baseline, current, baseline (n_interleaves of each; default 2)
— and writes BENCH_REPLAY_r{round}.json at the repo root:

    {"round": ..., "current_commit": ..., "baseline_commit": ...,
     "runs": [{"tree": ..., "total": ..., "io_before/io_after": ...}],
     "current":  {"total_min": ..., "total_best_sum": ..., "queries": ...},
     "baseline": {...},
     "ratio_min_totals": current.total_min / baseline.total_min,
     "per_query_ratio_worst": ...}

`total_min` is the best full-run total per tree (the judge's best-of-N
method); `total_best_sum` sums each query's min across that tree's runs
(tighter — a co-tenant burst poisons at most one run's sample of each
query).  The headline ratio uses total_min.  Each run's io_before /
io_after calibration samples are carried so a reader can confirm both
trees saw the same window; interleaving is what makes the RATIO
trustworthy even when the window itself is dirty.

Every run is a separate subprocess in its own tree, so each tree's own
bench.py and engine code run unmixed; the parquet inputs and
$SPARK_GRAFT_SF_DIR are shared.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sha(ref: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, "rev-parse", ref],
        check=True,
        capture_output=True,
        text=True,
    ).stdout.strip()


def _ensure_worktree(sha: str) -> str:
    path = f"/tmp/sg_replay_{sha[:12]}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", path, sha],
            check=True,
        )
    return path


def _run_bench(tree: str) -> dict:
    """One full bench.py run in `tree`; returns its JSON record plus the
    flattened io/calibration samples this artifact carries."""
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py failed in {tree} (exit {proc.returncode}):\n"
            f"{proc.stderr[-2000:]}"
        )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py in {tree} exited 0 but printed no JSON line; "
            f"stdout tail:\n{proc.stdout[-2000:]}\n"
            f"stderr tail:\n{proc.stderr[-1000:]}"
        )
    rec = json.loads(lines[-1])
    samples = rec.get("calibration", {}).get("samples", [])
    last = samples[-1] if samples else {}
    return {
        "total": rec["value"],
        "queries": rec["queries"],
        "io_before": last.get("io_before"),
        "io_after": last.get("io_after"),
        "calib_before": last.get("before"),
        "calib_after": last.get("after"),
        "contaminated": rec.get("calibration", {}).get("contaminated"),
    }


def _tree_summary(runs: list[dict]) -> dict:
    labels = runs[0]["queries"].keys()
    best_q = {
        lab: round(min(r["queries"][lab] for r in runs), 3) for lab in labels
    }
    return {
        "total_min": round(min(r["total"] for r in runs), 3),
        "total_best_sum": round(sum(best_q.values()), 3),
        "queries": best_q,
    }


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: bench_replay.py <baseline_ref> <round> [n_interleaves]")
    baseline_ref, round_n = sys.argv[1], int(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cur_sha = _sha("HEAD")
    # the artifact attributes the current tree's numbers to a commit
    # SHA, so a dirty working tree would be silently mislabeled —
    # refuse (SG_REPLAY_ALLOW_DIRTY=1 overrides; the artifact then
    # carries current_tree_dirty: true so the mislabel is at least
    # visible)
    dirty = bool(
        subprocess.run(
            ["git", "-C", REPO, "status", "--porcelain"],
            check=True,
            capture_output=True,
            text=True,
        ).stdout.strip()
    )
    if dirty and os.environ.get("SG_REPLAY_ALLOW_DIRTY") != "1":
        sys.exit(
            "bench_replay: working tree has uncommitted changes — the "
            "artifact would attribute them to HEAD's SHA. Commit first, "
            "or set SG_REPLAY_ALLOW_DIRTY=1 to record anyway (the "
            "artifact then carries current_tree_dirty: true)"
        )
    base_sha = _sha(baseline_ref)
    base_tree = _ensure_worktree(base_sha)

    runs: list[dict] = []
    for i in range(n):
        for tree_name, tree in (("current", REPO), ("baseline", base_tree)):
            print(
                f"# interleave {i + 1}/{n}: {tree_name} ({tree})",
                file=sys.stderr,
            )
            rec = _run_bench(tree)
            rec["tree"] = tree_name
            runs.append(rec)
            print(
                f"#   total {rec['total']}s  io {rec['io_before']}/"
                f"{rec['io_after']}  contaminated={rec['contaminated']}",
                file=sys.stderr,
            )

    cur = _tree_summary([r for r in runs if r["tree"] == "current"])
    base = _tree_summary([r for r in runs if r["tree"] == "baseline"])
    shared = set(cur["queries"]) & set(base["queries"])
    worst_lab = max(
        shared, key=lambda lab: cur["queries"][lab] / base["queries"][lab]
    )
    out = {
        "round": round_n,
        "current_commit": cur_sha,
        "current_tree_dirty": dirty,
        "baseline_commit": base_sha,
        "baseline_ref": baseline_ref,
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "n_interleaves": n,
        "runs": runs,
        "current": cur,
        "baseline": base,
        "ratio_min_totals": round(cur["total_min"] / base["total_min"], 3),
        "per_query_ratio_worst": {
            "label": worst_lab,
            "ratio": round(
                cur["queries"][worst_lab] / base["queries"][worst_lab], 3
            ),
        },
    }
    path = os.path.join(REPO, f"BENCH_REPLAY_r{round_n}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in (
        "round", "ratio_min_totals", "per_query_ratio_worst",
        "current_commit", "baseline_commit",
    )}))
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
