"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every queries() entry at a given sf_dir, runs the matching
oracle_sql() through DuckDB over the same parquet tables, and compares:
row count, sorted column names, and order-insensitive values (exact after
sorting; plus a tolerance pass to flag borderline float formatting).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from hannigan_conjunctisviribus_ploscompbio_2017_spark.schemas import TESTDATA_TABLES
from hannigan_conjunctisviribus_ploscompbio_2017_spark.session import get_spark


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
        return problems
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(dv):
            both_nan = sv.isna() & dv.isna()
            exact = ((sv == dv) | both_nan).all()
            if not exact:
                close = bool(
                    np.allclose(
                        sv.fillna(0).to_numpy(),
                        dv.fillna(0).to_numpy(),
                        rtol=1e-9,
                        atol=1e-12,
                    )
                    and (sv.isna() == dv.isna()).all()
                )
                diffs = (sv - dv).abs().max()
                tag = "FLOAT-CLOSE (hash may differ!)" if close else "VALUES DIFFER"
                problems.append(f"col {c}: {tag} maxdiff={diffs}")
        else:
            sv2 = sv.astype(str).where(~sv.isna(), "<NA>")
            dv2 = dv.astype(str).where(~dv.isna(), "<NA>")
            if not (sv2 == dv2).all():
                bad = (sv2 != dv2)
                i = int(bad.idxmax())
                problems.append(
                    f"col {c}: VALUES DIFFER e.g. row {i}: spark={sv2[i]!r} duck={dv2[i]!r} ({int(bad.sum())} rows)"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)

    n_pass = n_fail = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"   - {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
