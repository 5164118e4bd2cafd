"""Calibration-gated interleaved A/B harness for optimization work.

Usage:
  python tools/ab_check.py ENVVAR=a,b q1 [q2 ...]      # env-flag A/B
  python tools/ab_check.py - q1 [q2 ...]               # plain gated timing

Runs the named queries interleaved across the flag's modes, brackets
every round with bench.py's pure-CPU calibration sentinel, and counts a
round only when both ends sit inside the band (the host shows
multi-minute co-tenant load waves; un-gated timings here are noise).
Per-(query, mode) result = min across clean rounds. Honest-measurement
tool only — not part of the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CALIB_BAND_SEC, calibration_sec  # noqa: E402
from hannigan_conjunctisviribus_ploscompbio_2017_spark.queries_testdata import (  # noqa: E402
    QUERIES,
)
from hannigan_conjunctisviribus_ploscompbio_2017_spark.session import get_spark  # noqa: E402


def main() -> None:
    spec = sys.argv[1]
    names = sys.argv[2:]
    if spec == "-":
        var, modes = None, ["-"]
    else:
        var, modestr = spec.split("=", 1)
        modes = modestr.split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    want_clean = int(os.environ.get("AB_CLEAN_ROUNDS", "3"))
    max_rounds = int(os.environ.get("AB_MAX_ROUNDS", "12"))
    spark = get_spark("ab-check")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def set_mode(mode: str) -> None:
        if var is not None:
            os.environ[var] = mode
            spark._sg_table_cache = {}

    # warm every (query, mode) once
    for mode in modes:
        set_mode(mode)
        for n in names:
            QUERIES[n](spark, sf_dir).count()
    calibration_sec(spark)

    best: dict[tuple[str, str], float] = {}
    clean = 0
    for rnd in range(max_rounds):
        c0 = calibration_sec(spark)
        if c0 > CALIB_BAND_SEC:
            print(f"# round {rnd}: dirty before ({c0}s) — sleeping 30s", file=sys.stderr)
            time.sleep(30)
            continue
        sample: dict[tuple[str, str], float] = {}
        for mode in modes:
            set_mode(mode)
            for n in names:
                t0 = time.time()
                QUERIES[n](spark, sf_dir).count()
                sample[(n, mode)] = time.time() - t0
        c1 = calibration_sec(spark)
        if c1 > CALIB_BAND_SEC:
            print(f"# round {rnd}: dirty after ({c1}s) — discarding", file=sys.stderr)
            continue
        clean += 1
        for k, v in sample.items():
            best[k] = min(best.get(k, float("inf")), v)
        print(f"# round {rnd}: clean ({c0}/{c1}s) [{clean}/{want_clean}]", file=sys.stderr)
        if clean >= want_clean:
            break

    print(f"clean_rounds={clean}")
    for n in names:
        row = "  ".join(f"{m}={best.get((n, m), float('nan')):6.2f}" for m in modes)
        if len(modes) == 2:
            a, b = best.get((n, modes[0])), best.get((n, modes[1]))
            ratio = f"  ratio={b / a:5.2f}" if a and b else ""
        else:
            ratio = ""
        print(f"{n:30s} {row}{ratio}")
    for m in modes:
        tot = sum(best.get((n, m), float("nan")) for n in names)
        print(f"TOTAL {m}: {tot:7.2f}")


if __name__ == "__main__":
    main()
