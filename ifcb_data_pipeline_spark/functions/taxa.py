"""Taxonomic name cleaning — SURVEY §2.8 C1-C2.

Re-expresses the reference's gsub cascade
(``ifcb-data-pipeline.Rmd:936-971``; richer variant
``code/utils/clean_taxa_fn.R:31-50``) as an ordered chain of
``regexp_replace`` Catalyst expressions.  The order of the replacements is
semantically meaningful (e.g. morphology suffixes must be stripped before
word-boundary flag removal) and is preserved.

R's ``\\<cf\\>`` word boundaries map to ``\\b`` in Java regex; ``gsub``
replaces all occurrences, as does Spark's ``regexp_replace``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) in application order.
_CLEAN_STEPS: list[tuple[str, str]] = [
    ("_", " "),
    (" single cell", ""),
    (" chain", ""),
    (" coil", ""),
    (" filament", ""),
    (" pair", ""),
    ("-like", ""),
    (" like", ""),
    (" bundle", ""),
    # Reference order preserved EXACTLY (Rmd:946-949): ' larger than 30'
    # runs before ' larger than 30unidentified' (making the latter dead
    # code and leaving an 'Xunidentified' residue), while the 'smaller'
    # pair is ordered the other way round.  Asymmetric, but parity with
    # historical outputs beats tidiness here.
    (" larger than 30", ""),
    (" larger than 30unidentified", ""),
    (" smaller than 30unidentified", ""),
    (" smaller than 30", ""),
    (r"\bcf\b", ""),
    (r"\bspp\b", ""),
    (r"\bsp\b", ""),
    (" group", ""),
    ("  ", " "),
    (r"\bf\b", "f."),
    # Compound classes: "Snowella Woronichinia" → "Snowella/Woronichinia"
    (" ([A-Z])", "/$1"),
    (" ([A-Z])", "/$1"),
]


def clean_taxa_name(name: Column | str) -> Column:
    """Classifier label → cleaned query name for taxonomic resolution."""
    col = F.col(name) if isinstance(name, str) else name
    for pattern, replacement in _CLEAN_STEPS:
        col = F.regexp_replace(col, pattern, replacement)
    # First member of comma-joined merged classes, then trim.
    col = F.split(col, ",").getItem(0)
    return F.trim(col)


def species_flag(raw_name: Column | str) -> Column:
    """Space-joined sflag from the *raw* class name — reference semantics
    (``ifcb-data-pipeline.Rmd:994-1010``): CF is detected from
    ``-like``/``_cf_``/``_like`` substrings of the RAW name (not a cf word
    boundary), then SPP / GRP / SP word-boundary matches on the '_'→' '
    normalized name are APPENDED in that order — a label can carry several
    flags (e.g. ``'CF SPP'``).  Null when nothing matches."""
    col = F.col(raw_name) if isinstance(raw_name, str) else raw_name
    norm = F.regexp_replace(col, "_", " ")
    cf = F.when(
        col.contains("-like") | col.contains("_cf_") | col.contains("_like"),
        F.lit("CF "),
    ).otherwise(F.lit(""))
    spp = F.when(norm.rlike(r"\bspp\b"), F.lit("SPP ")).otherwise(F.lit(""))
    grp = F.when(norm.rlike(r"\bgroup\b"), F.lit("GRP ")).otherwise(F.lit(""))
    sp = F.when(norm.rlike(r"\bsp\b"), F.lit("SP ")).otherwise(F.lit(""))
    return F.nullif(F.trim(F.concat(cf, spp, grp, sp)), F.lit(""))


def name_type(cleaned: Column | str) -> Column:
    """C3 name-type classification (``clean_taxa_fn.R:52-64``):
    group / cf / like / multi / direct, in that precedence."""
    c = F.col(cleaned) if isinstance(cleaned, str) else cleaned
    multi = (
        c.rlike(r"^[A-Z][a-z]+-[A-Z][a-z]+$")
        | c.rlike(r"^[A-Z].*\s[A-Z]")
    )
    return (
        F.when(c.rlike(r"\bgroup$"), "group")
        .when(c.rlike(r"\bcf\b"), "cf")
        .when(c.rlike(r"-like$"), "like")
        .when(multi, "multi")
        .otherwise("direct")
    )


def extract_query_names(cleaned: Column | str, ntype: Column) -> Column:
    """C3 query extraction (``clean_taxa_fn.R:67-94``) → array<string>:
    cf drops the ' cf ' infix, like strips '-like', multi splits into
    capital-started name groups, direct strips trailing sp/spp."""
    c = F.col(cleaned) if isinstance(cleaned, str) else cleaned
    hyphen_multi = c.rlike(r"^[A-Z][a-z]+-[A-Z][a-z]+$")
    split_caps = F.split(F.regexp_replace(c, r"\s+([A-Z])", "|$1"), r"\|")
    return (
        F.when(ntype == "cf", F.array(F.regexp_replace(c, r"\s+cf\s+", " ")))
        .when(ntype == "like", F.array(F.regexp_replace(c, r"-like$", "")))
        .when(ntype == "multi",
              F.when(hyphen_multi, F.split(c, "-")).otherwise(split_caps))
        .otherwise(
            F.array(F.regexp_replace(F.regexp_replace(c, r"\s+spp$", ""), r"\s+sp$", ""))
        )
    )
