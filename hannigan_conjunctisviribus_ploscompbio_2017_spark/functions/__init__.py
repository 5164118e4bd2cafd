from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions.scalar import (
    composite_key,
    edge_weight,
    extract_genus,
    extract_species,
    length_normalize,
    recode_flag,
    recode_threshold,
    sanitize_key,
    split_composite_key,
)
from hannigan_conjunctisviribus_ploscompbio_2017_spark.functions import text

__all__ = [
    "sanitize_key",
    "extract_genus",
    "extract_species",
    "composite_key",
    "split_composite_key",
    "length_normalize",
    "edge_weight",
    "recode_threshold",
    "recode_flag",
    "text",
]
