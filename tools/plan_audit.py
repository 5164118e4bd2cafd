"""Plan audit across every registry entry: builds each queries() plan at
a given sf_dir and flags anti-patterns (guide §7.2) without running jobs
beyond what plan construction itself needs (eager centroid/codebook
resolves). Output: one line per entry with node counts; a summary of
flagged entries at the end.

Flags: BatchEvalPython (row-at-a-time Python), CartesianProduct
(non-broadcast cross join), SortMergeJoin (worth an eye at this data
scale), Exchange count, Python-eval nodes, window-without-partition.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hannigan_conjunctisviribus_ploscompbio_2017_spark.queries_testdata import (  # noqa: E402
    QUERIES,
)
from hannigan_conjunctisviribus_ploscompbio_2017_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("plan-audit")
    flagged: list[str] = []
    for name, fn in sorted(QUERIES.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            p = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name:40s} PLAN-ERROR {type(e).__name__}: {e}")
            flagged.append(name)
            continue
        import re

        ex = len(re.findall(r"\(\d+\) Exchange\b", p))
        bex = len(re.findall(r"\(\d+\) BroadcastExchange\b", p))
        smj = len(re.findall(r"SortMergeJoin", p))
        cart = len(re.findall(r"CartesianProduct", p))
        bep = len(re.findall(r"BatchEvalPython", p))
        aep = len(re.findall(r"ArrowEvalPython", p))
        flags = []
        if bep:
            flags.append(f"BatchEvalPython×{bep}")
        if cart:
            flags.append(f"CartesianProduct×{cart}")
        if smj:
            flags.append(f"SMJ×{smj}")
        line = (
            f"{name:40s} ex={ex:2d} bcast={bex:2d} arrowpy={aep}"
            + ("  << " + ", ".join(flags) if flags else "")
        )
        print(line)
        if flags:
            flagged.append(name)
    print("\nflagged:", len(flagged), flagged)


if __name__ == "__main__":
    main()
