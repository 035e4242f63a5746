"""Text-analysis column functions for training-data pipelines.

All pure ``pyspark.sql.functions`` Column expressions — JVM-side,
whole-stage-codegen'd, no Python in the hot path (input_hint mandate; the
reference's scalar-transform seam is ``internal/model/transformers.go:4-6``).
Each function has an exact ANSI-SQL twin in ``__spark_entry__.oracle_sql``.

Scale note: every expression here is embarrassingly parallel per-row —
no shuffle, no skew exposure; at 100 TB these run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny embedded stopword lists (public, language-characteristic function
# words). The heuristic scores text by stopword hits per language and picks
# the argmax — the classic cheap language-ID baseline (n-gram/function-word
# profiling, Cavnar & Trenkle 1994).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "nicht", "ein", "zu"],
    "es": ["el", "la", "los", "de", "y", "es", "que", "para", "con", "una"],
}

TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: str | Column, lowercase: bool = True) -> Column:
    """Whitespace tokens (the unit for shingling / stopword scoring)."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column) -> Column:
    """Whitespace token count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"\S+"), 0))


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single punctuation
    each count as one token (a cheap proxy for subword tokenizer load)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), 0))


def stopword_hits(col: str | Column, lang: str) -> Column:
    """Number of distinct stopwords of ``lang`` present in the text."""
    toks = F.array_distinct(tokens(col))
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]])))


def lang_id(col: str | Column) -> Column:
    """Cheap language ID: argmax of per-language stopword hits; 'und'
    (undetermined) when no list scores > 0. Ties break by language-code
    order (deterministic).

    Physically: ONE array_max over (hits, -rank, lang) structs — struct
    comparison is field-lexicographic, so max hits wins and ties fall to
    the alphabetically-first language (-rank). The obvious fold of
    chained ``when(hits > scored, ...)`` embeds the previous chain twice
    per language (2^n expression blowup past codegen limits — measured
    ~5x slower per pass on the quality-gate query)."""
    pairs = [
        F.struct(
            stopword_hits(col, lg).alias("h"),
            F.lit(-i).alias("r"),
            F.lit(lg).alias("lg"),
        )
        for i, lg in enumerate(sorted(STOPWORDS))
    ]
    best = F.array_max(F.array(*pairs))
    return F.when(best["h"] > 0, best["lg"]).otherwise(F.lit("und"))


def quality_features(col: str | Column) -> dict[str, Column]:
    """Quality-scoring features: length, alpha/space/punct ratios, mean
    token length — the usual cheap pre-filters for web-scale corpora."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    n1 = F.greatest(n, F.lit(1))
    n_alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    n_space = F.length(F.regexp_replace(c, "[^ ]", ""))
    # ALL whitespace, not just ASCII space: token_count splits on \s+, so
    # mean token length must subtract the same class — n - n_space counted
    # every newline/tab as token characters, systematically inflating the
    # feature on multiline web text (review finding; 'a\nb\nc' read 5/3
    # instead of 1). space_ratio keeps its own ASCII-space definition.
    n_nonws = F.length(F.regexp_replace(c, r"\s", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    n_tok = token_count(c)
    return {
        "n_chars": n,
        "n_tokens": n_tok,
        "alpha_ratio": n_alpha / n1,
        "space_ratio": n_space / n1,
        "punct_ratio": n_punct / n1,
        "mean_token_len": n_nonws / F.greatest(n_tok, F.lit(1)),
    }


def fingerprint(col: str | Column) -> Column:
    """Canonical document fingerprint: md5 of whitespace-collapsed,
    lowercased text (exact-dup detection robust to whitespace noise)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(F.regexp_replace(c, r"\s+", " "))))


# PII patterns deliberately use only portable regex constructs (character
# classes, bounded repetition, alternation — no lookaround, no \b) so the
# Java-regex engine (Spark) and the DuckDB oracle agree byte-for-byte.
PII_PATTERNS = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    # international (+CC ...) OR French-style national (0X xx xx xx xx,
    # separators OPTIONAL — the unseparated 0612345678 is the dominant
    # written form and a mandatory separator let it leak unredacted;
    # review finding) — the reference domain is French administrative
    # data, so the national format must not leak (reviewer finding)
    "PHONE": r"(\+[0-9]{1,3}([ .-][0-9]{1,4}){2,5}|0[1-9]([ .-]?[0-9]{2}){4})",
}


def redact_pii(col: str | Column) -> Column:
    """Training-corpus PII scrub: replace emails, IPv4 addresses, and
    international phone numbers with typed placeholders (``<EMAIL>`` …).
    Order matters: emails first (an address can embed digit runs), then
    IPs, then phones. Pure JVM regexp_replace chain — scan speed, the
    first-pass hygiene filter of any corpus pipeline."""
    c = F.col(col) if isinstance(col, str) else col
    for tag in ("EMAIL", "IPV4", "PHONE"):
        c = F.regexp_replace(c, PII_PATTERNS[tag], f"<{tag}>")
    return c


def pii_counts(col: str | Column) -> dict[str, Column]:
    """Per-kind PII match counts (emitted alongside redaction so the
    pipeline can quarantine documents above a PII-density threshold)."""
    c = F.col(col) if isinstance(col, str) else col
    out = {}
    remaining = c
    for tag in ("EMAIL", "IPV4", "PHONE"):
        out[f"n_{tag.lower()}"] = F.size(
            F.regexp_extract_all(remaining, F.lit(PII_PATTERNS[tag]), F.lit(0))
        )
        remaining = F.regexp_replace(remaining, PII_PATTERNS[tag], f"<{tag}>")
    return out


def dedup_lines(col: str | Column, sep: str = "\n") -> Column:
    """Within-document repetition removal: keep each line's FIRST
    occurrence, preserving order (the boilerplate/header filter of
    web-corpus pipelines — repeated nav bars, footers, chorus lines).
    Pure array expressions: split → array_distinct (order-preserving in
    Spark) → rejoin; scan speed, no shuffle. ``sep`` is a LITERAL
    separator (quoted before the regex split — '|' or '.' would
    otherwise split per character, reviewer finding)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_distinct(F.split(c, f"\\Q{sep}\\E")), sep)


def repeated_line_count(col: str | Column, sep: str = "\n") -> Column:
    """How many lines repetition removal would drop (quarantine metric:
    documents above a repeated-line ratio are usually boilerplate)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, f"\\Q{sep}\\E")
    return F.size(lines) - F.size(F.array_distinct(lines))
