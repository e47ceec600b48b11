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
    (" larger than 30unidentified", ""),
    (" larger than 30", ""),
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
    """sflag ∈ {CF, SPP, SP, GRP, null} from the *raw* class name
    (reference: ``ifcb-data-pipeline.Rmd:994-1021``,
    ``clean_taxa_fn.R:43-50``).  Checked on '_'→' ' normalized text with
    word boundaries; precedence CF > SPP > SP > GRP."""
    col = F.col(raw_name) if isinstance(raw_name, str) else raw_name
    norm = F.regexp_replace(col, "_", " ")
    return (
        F.when(norm.rlike(r"\bcf\b"), F.lit("CF"))
        .when(norm.rlike(r"\bspp\b"), F.lit("SPP"))
        .when(norm.rlike(r"\bsp\b"), F.lit("SP"))
        .when(norm.rlike(r"\bgroup\b"), F.lit("GRP"))
        .otherwise(F.lit(None).cast("string"))
    )


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
