"""Value standardization expressions (SURVEY.md §2.4 rows 28-29).

The reference enforces these by prompt text (configs/prompts.yaml:246-247):
numbers without currency symbols/commas; dates 'YYYY-MM-DD' or partial
'YYYY-MM'. Here they are Catalyst expressions usable on any string column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT_MULT = {
    "thousand": 1e3, "k": 1e3,
    "million": 1e6, "m": 1e6, "mm": 1e6,
    "billion": 1e9, "b": 1e9, "bn": 1e9,
    "trillion": 1e12, "t": 1e12,
}


def parse_money_expr(col: Column | str) -> Column:
    """'$1.2 billion' / '€250,000' / '1000000' → double dollars (unit word
    or suffix scaled, currency symbols and thousands separators stripped)."""
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    num = F.regexp_extract(c, r"([0-9][0-9,]*(?:\.[0-9]+)?)", 1)
    num_clean = F.regexp_replace(num, ",", "").try_cast("double")  # ANSI-safe
    unit = F.regexp_extract(c, r"(?:^|[\s0-9.])(thousand|million|billion|trillion|bn|mm|k|m|b|t)\b", 1)
    mult = F.lit(1.0)
    for u, m in _UNIT_MULT.items():
        mult = F.when(unit == u, F.lit(m)).otherwise(mult)
    return F.when(num_clean.isNotNull(), num_clean * mult)


def parse_percentage_expr(col: Column | str) -> Column:
    """'25.5%' / '25.5 percent' → double."""
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    return F.regexp_extract(c, r"([0-9]+(?:\.[0-9]+)?)\s*(?:%|percent)?", 1).try_cast("double")


def normalize_date_expr(col: Column | str) -> Column:
    """Multi-format date normalization → 'YYYY-MM-DD', or partial 'YYYY-MM'
    preserved as-is (transactionDate stays a STRING column; a derived date
    column may cast the full dates — SURVEY §7.4 partial-date hazard)."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    iso_full = F.when(c.rlike(r"^\d{4}-\d{2}-\d{2}$"), c)
    iso_partial = F.when(c.rlike(r"^\d{4}-\d{2}$"), c)
    slash = F.when(
        c.rlike(r"^\d{1,2}/\d{1,2}/\d{4}$"),
        F.date_format(F.to_date(c, "M/d/yyyy"), "yyyy-MM-dd"),
    )
    verbose = F.when(
        c.rlike(r"^[A-Za-z]+ \d{1,2}, \d{4}$"),
        F.date_format(F.to_date(c, "MMMM d, yyyy"), "yyyy-MM-dd"),
    )
    return F.coalesce(iso_full, iso_partial, slash, verbose)


def pred_label_expr(col: Column | str) -> Column:
    """Edge label = upper-cased relation type at storage time
    (reference src/db/neo4j_handler.py:264)."""
    return F.upper(F.col(col) if isinstance(col, str) else col)


def namespaced_id_expr(doc_col: Column | str, local_col: Column | str) -> Column:
    """{file}_{original_id} entity namespacing (reference :317,336)."""
    d = F.col(doc_col) if isinstance(doc_col, str) else doc_col
    l = F.col(local_col) if isinstance(local_col, str) else local_col
    return F.concat_ws("_", d, l)
