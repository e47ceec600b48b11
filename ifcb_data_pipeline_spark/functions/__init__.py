from .bin_id import make_bin_id, parse_bin_id, strip_instrument
from .scalars import (
    f1_score,
    haversine_km,
    normalize_encoding,
    null_if_sentinel,
    signif,
)
from .taxa import clean_taxa_name, species_flag

__all__ = [
    "make_bin_id",
    "parse_bin_id",
    "strip_instrument",
    "f1_score",
    "haversine_km",
    "normalize_encoding",
    "null_if_sentinel",
    "signif",
    "clean_taxa_name",
    "species_flag",
]
