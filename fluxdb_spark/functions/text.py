"""Text-analysis primitives for the training-data pipeline layer.

All hot-path expressions are built-in `pyspark.sql.functions` (JVM-side,
codegen'd) — no Python UDFs. Each primitive has a DuckDB-SQL twin in
`catalog.py`; the shared constants here keep the two in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopword sets for the n-gram/stopword language-ID heuristic.
# Deterministic tie-break order: en, es, de, fr (then 'und').
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "to", "in"],
    "es": ["el", "la", "de", "los", "y", "que"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "une"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

WORD_RE = "[a-z]+|[0-9]+"  # BPE-ish word/number pieces


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def wordpiece_count(text: Column) -> Column:
    """Regex token count over lowercased text (the BPE-ish approximation)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), F.lit(0)))


def marker_hits(text: Column, markers: list[str]) -> Column:
    """How many tokens fall in a marker set (JVM-side higher-order fn)."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*markers)))


def stopword_ratio(text: Column) -> Column:
    return F.round(
        marker_hits(text, STOPWORDS) / token_count(text), 4
    )


def avg_token_len(text: Column) -> Column:
    n = token_count(text)
    total = F.aggregate(
        tokens(text), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total / n, 4)


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: length saturation +
    stopword presence, arithmetic only. Truncated with floor (not round):
    the raw double is bit-identical across engines, while decimal rounding
    modes differ exactly at .xxxx5 boundaries."""
    n = token_count(text)
    length_part = F.least(n / F.lit(100.0), F.lit(1.0))
    raw = 0.5 * length_part + 0.5 * (
        marker_hits(text, STOPWORDS) / n
    )
    return F.floor(raw * 10000) / 10000.0


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: marker_hits(text, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(text: Column) -> Column:
    """Argmax over marker-set hit counts with fixed tie-break order;
    'und' when no marker hits at all."""
    s = lang_scores(text)
    en, es, de, fr = s["en"], s["es"], s["de"], s["fr"]
    return (
        F.when((en >= es) & (en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((es >= de) & (es >= fr) & (es > 0), F.lit("es"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


# --- SQL twin fragments (DuckDB) ------------------------------------------


def sql_marker_hits(expr: str, markers: list[str]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return (
        f"len(list_filter(string_split({expr}, ' '), t -> t IN ({lst})))"
    )


def sql_token_count(expr: str) -> str:
    return f"len(string_split({expr}, ' '))"


def sql_lang_id(expr: str) -> str:
    s = {
        lang: sql_marker_hits(expr, ws) for lang, ws in LANG_MARKERS.items()
    }
    return f"""CASE
      WHEN {s['en']} >= {s['es']} AND {s['en']} >= {s['de']} AND {s['en']} >= {s['fr']} AND {s['en']} > 0 THEN 'en'
      WHEN {s['es']} >= {s['de']} AND {s['es']} >= {s['fr']} AND {s['es']} > 0 THEN 'es'
      WHEN {s['de']} >= {s['fr']} AND {s['de']} > 0 THEN 'de'
      WHEN {s['fr']} > 0 THEN 'fr'
      ELSE 'und' END"""
