"""Scalar function surface (SURVEY §2.7, F1-F11).

Every one of these is a pure Catalyst expression — JVM-side, codegen'd,
vectorizable — replacing the reference's Perl/awk/R one-liners.  No Python
UDFs here: this is the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 — the universal key normalizer.
# Reference: bin/BenchmarkDatabaseCreation.pl:99-101 (`s/[^A-Z^a-z^0-9^\t]+/_/g`).
def sanitize_key(col: Column | str) -> Column:
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, "[^A-Za-z0-9]+", "_")


# F2 — genus / species extraction from sanitized names
# Reference: bin/BenchmarkDatabaseCreation.pl:119-125.
def extract_genus(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "_").getItem(0)


def extract_species(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, "_")
    return F.concat_ws("_", parts.getItem(0), parts.getItem(1))


# F4 — composite keys. Reference: bin/CompareSkin.R:92,123.
def composite_key(*cols: Column | str, sep: str = "__") -> Column:
    return F.concat_ws(sep, *[F.col(c) if isinstance(c, str) else c for c in cols])


# F5 — composite key split. Reference: bin/CompareSkin.R:144-148.
def split_composite_key(col: Column | str, names: list[str], sep: str = "__") -> list[Column]:
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    # F.split treats sep as a REGEX while composite_key's concat_ws is
    # literal — escape so sep='.'/'|'/'+' round-trips instead of
    # matching every character
    parts = F.split(c, _re.escape(sep))
    return [parts.getItem(i).alias(n) for i, n in enumerate(names)]


# F6 — length normalization round(1e7 * abundance / length).
# Reference: bin/interpersonaldiversity.R:41-42; doc/manuscript.md:161-165.
def length_normalize(abundance: Column | str, length: Column | str) -> Column:
    a = F.col(abundance) if isinstance(abundance, str) else abundance
    ln = F.col(length) if isinstance(length, str) else length
    return F.round(F.lit(1e7) * a / ln, 0)


# F7 — edge weight log10(a*b) (+eps variant used by CompareSkin.R:142).
# Reference: bin/interpersonaldiversity.R:78.
def edge_weight(a: Column | str, b: Column | str, eps: float = 0.0) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prod = ca * cb
    if eps:
        prod = prod + F.lit(eps)
    return F.log10(prod)


# F8 — conditional recode. Reference: bin/CalculatePredModel.R:40-44.
def recode_threshold(
    col: Column | str, threshold: float = 0.0, pos: str = "Interacts", neg: str = "NotInteracts"
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > threshold, pos).otherwise(neg)


# F10 — "TRUE"→1 recode. Reference: bin/CalculatePredModel.R:36.
def recode_flag(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == "TRUE", F.lit(1)).when(c == "FALSE", F.lit(0)).otherwise(
        c.cast("int")
    )
