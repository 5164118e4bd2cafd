"""Regenerate the frozen fixture tables backing the fixture-oracle
entries (gk_greedy_modularity, gk_alpha_centrality).

Both queries are exact deterministic computations (CNM agglomeration
with deterministic tie-breaks; numpy dense (I-alpha*A)^-1 solve), but
their algorithms are not SQL-expressible, so their DuckDB oracles are
literal expected tables for the driver's sf0.01 gate — the same
technique ss_srp_lsh_topk uses for its literal hyperplanes.  This
script re-runs the queries at sf0.01 and rewrites
hannigan_conjunctisviribus_ploscompbio_2017_spark/oracle_fixtures.py; run it whenever the kernel
semantics (NOT the testdata — that is driver-frozen) intentionally
change, and eyeball the diff.

Usage: python tools/gen_fixture_oracles.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

OUT = "/root/repo/hannigan_conjunctisviribus_ploscompbio_2017_spark/oracle_fixtures.py"

HEADER = '''"""Frozen expected outputs for the fixture-oracle entries — generated
by tools/gen_fixture_oracles.py at sf0.01 (the driver's correctness
scale).  Do not hand-edit; regenerate and review the diff instead."""

# fmt: off
'''


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.queries_testdata import QUERIES
    from hannigan_conjunctisviribus_ploscompbio_2017_spark.session import get_spark

    spark = get_spark("gen-fixture-oracles")
    blocks = [HEADER]
    for name, var in [
        ("gk_greedy_modularity", "GK_GREEDY_MODULARITY_SF001"),
        ("gk_alpha_centrality", "GK_ALPHA_CENTRALITY_SF001"),
    ]:
        import numpy as np

        def lit(v):
            if isinstance(v, (float, np.floating)):
                return repr(float(v))
            if isinstance(v, (int, np.integer)):
                return repr(int(v))
            return repr(str(v))

        pdf = QUERIES[name](spark, sf_dir).toPandas()
        lines = [f"{var} = ["]
        for row in pdf.itertuples(index=False):
            lines.append("    (" + ", ".join(lit(v) for v in row) + "),")
        lines.append("]")
        blocks.append("\n".join(lines))
        print(f"{name}: froze {len(pdf)} rows")
    with open(OUT, "w") as f:
        f.write("\n\n".join(blocks) + "\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
