"""Text-analysis functions for corpus curation — all pure Catalyst
expressions (whole-stage codegen, SQL-oracle-able); the winnowing
fingerprint lives in operators/dedup.py as a window-min DataFrame op
(JVM-side since round 2).

These generalize the reference's minimal string handling (extension
filter build-index.py:32-34, lowercase prefix parsing query-index.py) to
the document-quality layer a 100 TB training-data pipeline needs."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword inventories for the language-ID heuristic: deterministic,
# SQL-expressible (the DuckDB oracle uses the same lists), intentionally
# tiny — the point is the Spark plumbing, a real model slots in behind
# the same column contract
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "y", "una"],
}


def token_count(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(c, " "))


# GPT-2-style pretokenizer pattern, lookahead-free AND with an explicit
# whitespace class so it runs identically under Java regex (Spark) and
# RE2 (DuckDB oracle) — the engines disagree on \s membership (Java
# includes \x0B, RE2 does not).  Contractions, space-prefixed letter
# runs, digit runs, punctuation runs, whitespace runs.
_WS = r" \t\n\r\f\x0B"
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[a-zA-Z]+"
    r"| ?[0-9]+"
    rf"| ?[^a-zA-Z0-9{_WS}]+"
    rf"|[{_WS}]+"
)


def bpe_token_count(col: str | Column) -> Column:
    """BPE-ish token count: number of pretokenizer segments — the unit a
    real BPE tokenizer would then merge within.  Pure Catalyst
    (regexp_count, whole-stage codegen); counts whitespace runs too,
    mirroring byte-level BPE's explicit-space tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_SPLIT_RE))


def _marker_hits(c: Column, words: list[str]) -> Column:
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))
    out = F.lit(0)
    for w in words:
        out = out + F.size(F.split(padded, f" {w} ")) - F.lit(1)
    return out


def lang_id(col: str | Column) -> Column:
    """Best-scoring language by stopword-marker frequency; 'und'
    (undetermined) when no marker hits.  Ties break alphabetically
    (deterministic).  n-gram-frequency heuristic shape: swap the marker
    lists for character-n-gram profiles without touching callers."""
    c = F.col(col) if isinstance(col, str) else col
    scores = [
        F.struct(
            _marker_hits(c, words).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items(), reverse=True)
    ]
    # greatest = max by (hits, lang): score ties break toward the
    # lexicographically LARGEST language code (the SQL oracle checks
    # fr -> es -> en -> de in that same order)
    best = F.greatest(*scores)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(col: str | Column) -> Column:
    """Composite [0,1] quality heuristic: alpha ratio, mean word length
    band, and stopword presence — the length/punct/stopword-ratio family.
    Deterministic, pure SQL."""
    c = F.col(col) if isinstance(col, str) else col
    length = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    alpha_ratio = alpha / F.nullif(length, F.lit(0))
    n_tok = F.size(F.split(c, " "))
    mean_wl = (length - n_tok + 1) / F.nullif(n_tok, F.lit(0))
    wl_ok = F.when((mean_wl >= 2) & (mean_wl <= 12), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    stop_hits = _marker_hits(c, LANG_MARKERS["en"])
    stop_ok = F.when(stop_hits > 0, F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        (F.coalesce(alpha_ratio, F.lit(0.0)) + wl_ok + stop_ok) / F.lit(3.0),
        6,
    )


def content_fingerprint(col: str | Column) -> Column:
    """Exact-content 64-bit fingerprint: xxhash64 of normalized text
    (lowercase, collapsed whitespace) — the exact-dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), "\\s+", " "))


# PII patterns chosen for Java-regex / RE2 (DuckDB) dialect parity: no
# lookarounds, no backrefs — the same strings compile and match
# identically on both engines, which is what lets the scrub be
# SQL-oracled.  Conservative by design (a production scrub would add
# locale-specific patterns behind the same interface).
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_counts(col: str | Column) -> dict[str, Column]:
    """{kind: count} of PII matches — pure Catalyst regexp_count
    (whole-stage codegen; the 100 TB scrub is one scan, no Python)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(c, F.lit(pat)).cast("long")
        for kind, pat in PII_PATTERNS.items()
    }


def pii_scrub(col: str | Column) -> Column:
    """Redact every PII match with a typed placeholder — the curation
    stage run before training-corpus export.  Order matters: emails
    first (an email may contain digits that phone/ip patterns could
    otherwise nibble at), then phones, then IPs."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for kind in ("email", "phone", "ipv4"):
        out = F.regexp_replace(
            out, PII_PATTERNS[kind], f"<{kind.upper()}>"
        )
    return out
