"""Scalar normalization functions (SURVEY.md §2.8) as Spark Column builders.

Each function re-expresses a reference semantic declaratively so it runs
JVM-side inside whole-stage codegen (no Python in the hot path):

- clean_text         -> reference trials_extractor/processors/cleaner.py:10-35
- normalize_string   -> trials_extractor/processors/normalizer.py:14-32
- normalize_number   -> trials_extractor/processors/normalizer.py:34-64
- normalize_date     -> trials_extractor/utils/date_utils.py:13-48
- normalize_boolean  -> trials_extractor/utils/date_utils.py:50-71
- extract_year       -> trials_extractor/utils/date_utils.py:73-94
- calculate_duration -> trials_extractor/utils/date_utils.py:96-120
- is_date_valid      -> trials_extractor/utils/date_utils.py:122-133
- normalize_age_range-> trials_extractor/processors/normalizer.py:87-115
- normalize_country  -> trials_extractor/processors/normalizer.py:117-176
- normalize_phase    -> trials_extractor/processors/normalizer.py:178-213
- normalize_list     -> trials_extractor/processors/normalizer.py:66-85
- truncate_ellipsis  -> st_trial_analytics.py:513-517 (P13)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# U+00A0 nbsp, U+2019 apostrophe, U+2013/14 dashes, U+201C/1D quotes
_CLEAN_REPLACEMENTS = [
    (" ", " "),
    ("’", "'"),
    ("–", "-"),
    ("—", "-"),
    ("“", '"'),
    ("”", '"'),
]


def clean_text(col: Column) -> Column:
    """Collapse whitespace runs, strip, then the fixed unicode-replacement
    chain — the byte-identity invariant (F2). Same order as the reference:
    collapse+strip FIRST, replacements AFTER (so a nbsp survives the
    collapse because Python's \\s matches it but Java's \\s does not —
    we use the unicode flag to match reference behavior)."""
    # Python re \s+ matches unicode whitespace incl. U+00A0; Spark's Java
    # regex needs (?U) for the same class.
    c = F.regexp_replace(col, r"(?U)\s+", " ")
    c = F.trim(c)
    for src, dst in _CLEAN_REPLACEMENTS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def normalize_string(col: Column) -> Column:
    """Collapse internal whitespace and trim (F3)."""
    return F.trim(F.regexp_replace(col, r"(?U)\s+", " "))


def normalize_number_long(col: Column) -> Column:
    """First arm of the reference's tri-state coercion: int if parseable (F4)."""
    return F.trim(col).try_cast("long")


def normalize_number_double(col: Column) -> Column:
    """Second arm: float with ','->'.' decimal comma (F4)."""
    return F.replace(F.trim(col), F.lit(","), F.lit(".")).try_cast("double")


def normalize_number_canonical(col: Column) -> Column:
    """Tri-state modeled as canonical string: long repr if int, else double
    repr, else the original string (F4; SURVEY §7 'hard parts')."""
    as_long = normalize_number_long(col)
    as_double = normalize_number_double(col)
    return F.coalesce(
        as_long.cast("string"),
        as_double.cast("string"),
        col,
    )


_DATE_FORMATS = ["yyyy-MM-dd", "dd/MM/yyyy", "dd-MM-yyyy", "dd.MM.yyyy"]


def normalize_date(col: Column) -> Column:
    """Strip junk chars then try the reference's explicit format list
    (dayfirst semantics are encoded by the dd-first formats), output a
    DateType or null (F5).

    Model choice vs the reference (date_utils.py:13-48): the reference
    tries ``dateutil.parser.parse(dayfirst=True)`` BEFORE its explicit
    format list, and returns the ORIGINAL STRING on total failure (its
    ``extract_year``/``is_date_valid`` then test for that passthrough
    marker). dateutil's open-ended grammar is not expressible as JVM
    expressions; this engine models parse success as the reference's
    own configured format list and failure as a typed NULL.
    ``is_date_valid`` and ``extract_year`` below are aligned to the
    same model (NULL == the reference's passthrough marker), so the
    three functions stay mutually consistent — the deliberate,
    documented deviation is only that free-form dateutil-only inputs
    ("Jan 3rd 2020") normalize via the regex-year fallback rather than
    a full parse."""
    cleaned = F.regexp_replace(col, r"[^0-9/.\-]", "")
    return F.coalesce(*[F.try_to_date(cleaned, fmt) for fmt in _DATE_FORMATS])


_TRUE_VOCAB = ["yes", "y", "true", "t", "1", "oui"]
_FALSE_VOCAB = ["no", "n", "false", "f", "0", "non"]


def normalize_boolean(col: Column) -> Column:
    """Vocabulary-driven boolean (F6)."""
    lowered = F.lower(F.trim(col))
    return (
        F.when(lowered.isin(_TRUE_VOCAB), F.lit(True))
        .when(lowered.isin(_FALSE_VOCAB), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def extract_year(col: Column) -> Column:
    """Year of the normalized date, with the reference's regex fallback
    \\b(19|20)\\d{2}\\b (F7)."""
    from_date = F.year(normalize_date(col))
    from_regex = F.nullif(
        F.regexp_extract(col, r"\b((?:19|20)\d{2})\b", 1), F.lit("")
    ).try_cast("int")
    return F.coalesce(from_date, from_regex)


def calculate_duration(start: Column, end: Column) -> Column:
    """Days between two normalized dates (F8)."""
    return F.datediff(normalize_date(end), normalize_date(start))


def is_date_valid(col: Column) -> Column:
    """True when normalization produced a real date (F9)."""
    return normalize_date(col).isNotNull()


def normalize_age_range(col: Column) -> Column:
    """'65+' -> {min:65,max:null}; '18-64' -> {min:18,max:64} (F10).

    Exact reference branching (normalizer.py:87-115, findall-based):
    a '+' anywhere with at least one number sets ONLY min (even if a
    '-' is also present); else a '-' anywhere with at least TWO numbers
    sets min and max from the first two digit runs (the dash need not
    sit between them); anything else — including a bare number like
    '18 years' — is {null, null}. Golden-tested against an independent
    Python model in tests/test_normalize_reference.py."""
    first = F.nullif(F.regexp_extract(col, r"(\d+)", 1), F.lit("")).try_cast(
        "int"
    )
    # second maximal digit run anywhere after the first (findall order)
    second = F.nullif(
        F.regexp_extract(col, r"\d+\D+(\d+)", 1), F.lit("")
    ).try_cast("int")
    has_plus = col.contains("+")
    has_dash = col.contains("-")
    min_age = F.when(has_plus & first.isNotNull(), first).when(
        ~has_plus & has_dash & second.isNotNull(), first
    )
    max_age = F.when(
        ~has_plus & has_dash & second.isNotNull(), second
    )
    return F.struct(min_age.alias("min"), max_age.alias("max"))


# Reference map is 38 entries (normalizer.py:117-176); representative subset
# with identical lookup semantics: lowercase key -> canonical, passthrough
# otherwise. At scale this becomes a broadcast-joined dim table.
_COUNTRY_MAP = {
    "france": "France",
    "fr": "France",
    "germany": "Germany",
    "de": "Germany",
    "deutschland": "Germany",
    "spain": "Spain",
    "es": "Spain",
    "espana": "Spain",
    "italy": "Italy",
    "it": "Italy",
    "italia": "Italy",
    "united states": "United States",
    "usa": "United States",
    "us": "United States",
    "united kingdom": "United Kingdom",
    "uk": "United Kingdom",
    "great britain": "United Kingdom",
    "netherlands": "Netherlands",
    "nl": "Netherlands",
    "belgium": "Belgium",
    "be": "Belgium",
    "portugal": "Portugal",
    "pt": "Portugal",
    "poland": "Poland",
    "pl": "Poland",
    "austria": "Austria",
    "at": "Austria",
    "ireland": "Ireland",
    "ie": "Ireland",
    "denmark": "Denmark",
    "dk": "Denmark",
    "sweden": "Sweden",
    "se": "Sweden",
    "norway": "Norway",
    "no": "Norway",
    "finland": "Finland",
    "fi": "Finland",
    "greece": "Greece",
    "gr": "Greece",
}


def normalize_country(col: Column) -> Column:
    """Map-literal lookup with passthrough (F11)."""
    pairs = []
    for k, v in _COUNTRY_MAP.items():
        pairs.extend([F.lit(k), F.lit(v)])
    mapping = F.create_map(*pairs)
    return F.coalesce(mapping[F.lower(F.trim(col))], col)


_PHASE_KEYWORDS = {
    "early": "EARLY PHASE I",
    "preclinical": "PRECLINICAL",
    "pilot": "PHASE I",
    "pivotal": "PHASE III",
    "registration": "PHASE III",
}


def normalize_phase(col: Column) -> Column:
    """Regex Phase\\s+([IViv]+) -> 'PHASE <UPPER>'; else keyword map (F12)."""
    roman = F.upper(F.regexp_extract(col, r"(?i)phase\s+([IViv]+)", 1))
    keyword = F.lower(F.trim(col))
    expr = F.when(roman != "", F.concat(F.lit("PHASE "), roman))
    for k, v in _PHASE_KEYWORDS.items():
        expr = expr.when(keyword.contains(k), F.lit(v))
    return expr.otherwise(col)


def normalize_list(col: Column, sep: str = ",") -> Column:
    r"""Split, trim items, drop empties (F13). Fidelity details: the
    separator is a LITERAL (regex-escaped — the reference uses
    ``str.split``), and item trimming is Python ``str.strip()``
    semantics (ALL whitespace incl. tabs/unicode via ``(?U)\s``), not
    SQL ``trim`` which strips spaces only — so a tab-padded item trims
    clean and a whitespace-only item is dropped, exactly as the
    reference does. (The DuckDB oracle twin uses ASCII ``\s``; equal
    on any ASCII corpus.)"""
    import re as _re

    return F.filter(
        F.transform(
            F.split(col, _re.escape(sep)),
            lambda x: F.regexp_replace(x, r"(?U)^\s+|\s+$", ""),
        ),
        lambda x: x != "",
    )


def truncate_ellipsis(col: Column, n: int = 50) -> Column:
    """Display truncation x[:n] + '...' (P13)."""
    return F.when(
        F.length(col) > n, F.concat(F.substring(col, 1, n), F.lit("..."))
    ).otherwise(col)
