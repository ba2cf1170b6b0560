"""Text-analysis column expressions for LLM-data pipelines.

All pure built-in expressions (JVM-side, codegen'd, zero UDFs) so they
run at full scan speed on 100 TB of documents — the design principle the
reference applies to its quality operators
(`/root/reference/bdq/functions.py` uses only built-ins; SURVEY.md §2.3
"UDF: none").  Extension mandate: BASELINE.json north_star (language-ID,
quality scoring, token counting, fingerprinting).

Engine-parity notes (for the DuckDB oracles): ``md5``, ``\\s+`` splits
and ASCII-punctuation classes behave identically in Spark (Java regex)
and DuckDB (RE2) — ``\\p{Punct}`` (Java) == ``[[:punct:]]`` (RE2); CJK
ranges are ``[\\u4e00-\\u9fff]`` (Java) == ``[\\x{4e00}-\\x{9fff}]``
(RE2).
"""

from __future__ import annotations

from typing import Dict, List, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "token_count",
    "bpe_ish_tokens",
    "bpe_ish_token_count",
    "BPE_ISH_PATTERN",
    "word_tokens",
    "char_count",
    "punct_count",
    "punct_ratio",
    "stopword_count",
    "stopword_ratio",
    "cjk_count",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "redact_pii",
    "pii_count",
    "PII_PATTERNS",
    "STOPWORDS",
]

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: Tiny deterministic per-language stopword lists for n-gram/stopword
#: language scoring.  Order of the dict defines the argmax tie priority.
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "es"],
    "de": ["der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"],
    "fr": ["le", "les", "des", "et", "une", "est", "pour", "dans", "au", "sur"],
}


def normalize_text(c: ColumnOrName) -> Column:
    """Lowercase, collapse whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))


def char_count(c: ColumnOrName) -> Column:
    """Unicode character count."""
    return F.length(_col(c))


def token_count(c: ColumnOrName) -> Column:
    """Whitespace-delimited token count; empty/blank text counts 0.

    Counts non-empty split results rather than trimming first — Spark's
    ``trim`` strips only SPACES, so tab/newline-only text would otherwise
    produce phantom tokens.
    """
    return F.size(F.filter(F.split(_col(c), r"\s+"), lambda x: x != ""))


def word_tokens(c: ColumnOrName) -> Column:
    """Lowercased alphanumeric word array (non-alnum runs are separators).

    Splits on ``[^a-z0-9]+`` after lowercasing; leading/trailing empty
    strings are removed so the array holds only real words.
    """
    arr = F.split(F.lower(_col(c)), "[^a-z0-9]+")
    return F.filter(arr, lambda x: x != "")


def punct_count(c: ColumnOrName) -> Column:
    """Count of ASCII punctuation chars (Java ``\\p{Punct}`` class)."""
    col = _col(c)
    return char_count(col) - F.length(F.regexp_replace(col, r"\p{Punct}", ""))


def punct_ratio(c: ColumnOrName) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    col = _col(c)
    return punct_count(col) / F.greatest(char_count(col), F.lit(1))


def stopword_count(c: ColumnOrName, stopwords: List[str]) -> Column:
    """Number of tokens that are in ``stopwords``."""
    words = word_tokens(c)
    sw = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(words, lambda x: F.array_contains(sw, x)))


def stopword_ratio(c: ColumnOrName, stopwords: List[str] = None) -> Column:
    """Stopword tokens / total word tokens (0 for wordless text)."""
    words = word_tokens(c)
    sw_cnt = stopword_count(c, stopwords or STOPWORDS["en"])
    return sw_cnt / F.greatest(F.size(words), F.lit(1))


def cjk_count(c: ColumnOrName) -> Column:
    """Count of CJK-unified-ideograph characters."""
    return F.length(F.regexp_replace(_col(c), "[^一-鿿]", ""))


def language_id(c: ColumnOrName) -> Column:
    """Heuristic language ID over {zh, en, es, de, fr}.

    ``zh`` when >5% of characters are CJK ideographs; otherwise argmax of
    per-language stopword hit counts with ties resolved in STOPWORDS
    order (en > es > de > fr).  Fully deterministic and expressible in
    ANSI SQL for the oracle.
    """
    col = _col(c)
    counts = {
        lang: stopword_count(col, words) for lang, words in STOPWORDS.items()
    }
    langs = list(STOPWORDS)
    expr = F.lit(langs[-1])
    # build CASE from the lowest priority upward
    for i in range(len(langs) - 2, -1, -1):
        lang = langs[i]
        cond = None
        for other in langs[i + 1:]:
            ge = counts[lang] >= counts[other]
            cond = ge if cond is None else (cond & ge)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return F.when(
        cjk_count(col) * 20 > char_count(col), F.lit("zh")
    ).otherwise(expr)


def quality_score(c: ColumnOrName) -> Column:
    """Deterministic 0-1 quality heuristic for documents.

    Rewards reasonable length (saturating at 500 chars), moderate mean
    token length (2-12 chars), low punctuation share and the presence of
    stopwords — the classic cheap pre-filters applied before expensive
    model-based scoring in training-data pipelines.
    """
    col = _col(c)
    chars = char_count(col).cast("double")
    tokens = token_count(col).cast("double")
    length_component = F.least(chars / F.lit(500.0), F.lit(1.0))
    mean_token_len = chars / F.greatest(tokens, F.lit(1.0))
    token_len_ok = (
        (mean_token_len >= 2.0) & (mean_token_len <= 12.0)
    ).cast("double")
    punct_component = F.lit(1.0) - F.least(
        punct_ratio(col) * 4.0, F.lit(1.0)
    )
    any_sw = F.lit(0.0)
    for words in STOPWORDS.values():
        any_sw = any_sw + stopword_count(col, words).cast("double")
    sw_component = F.least(any_sw / F.lit(5.0), F.lit(1.0))
    score = (
        length_component * 0.3
        + token_len_ok * 0.2
        + punct_component * 0.25
        + sw_component * 0.25
    )
    return F.when(tokens == 0, F.lit(0.0)).otherwise(F.round(score, 6))


#: BPE-style pretokenizer pattern (GPT-2-like, simplified to avoid
#: lookahead so RE2 engines — DuckDB oracles — match Java regex exactly):
#: contractions, space-prefixed letter runs, digit runs, punct runs.
BPE_ISH_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def bpe_ish_tokens(c: ColumnOrName) -> Column:
    """BPE-style pretokenization (array<string>) over lowercased text.

    Approximates how a byte-pair-encoding tokenizer's pretokenizer splits
    text — contractions split off, runs of letters/digits/punctuation kept
    whole with their leading space — giving a much better LLM-token-count
    estimate than whitespace splitting (which undercounts punctuation-
    heavy text and merges ``don't`` into one token).
    """
    return F.regexp_extract_all(F.lower(_col(c)), F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(c: ColumnOrName) -> Column:
    """Number of BPE-ish pretokens (the cheap LLM-token-count proxy)."""
    return F.size(bpe_ish_tokens(c))


def doc_fingerprint(c: ColumnOrName) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.

    md5 exists in both Spark and DuckDB, so fingerprints are
    oracle-checkable; at scale the 32-hex string (or ``unhex`` to 16
    bytes) is the exact-dedup join key.
    """
    return F.md5(normalize_text(c))


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: redaction patterns, deliberately restricted to syntax that means the
#: same thing in Java regex (Spark) and RE2 (DuckDB/Go) so oracles and
#: cross-engine pipelines agree: no backrefs, no lookaround
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "long_digits": r"\b\d{9,}\b",  # phone/SSN/account-number shaped runs
}


def redact_pii(c: ColumnOrName, kinds: tuple = ("email", "ipv4", "long_digits")) -> Column:
    """Replace PII-shaped substrings with ``[<KIND>]`` markers.

    A chain of ``regexp_replace`` expressions — whole-stage codegen, no
    UDF, linear in text size.  Kinds apply in the declared order
    (email before long_digits, so a digit-heavy local-part is redacted
    as email, not as a number).  This is pattern-shaped scrubbing for
    training corpora, not a compliance guarantee.
    """
    col = _col(c)
    for kind in kinds:
        if kind not in PII_PATTERNS:
            raise ValueError(f"unknown PII kind: {kind!r}")
        col = F.regexp_replace(col, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return col


def pii_count(c: ColumnOrName, kind: str) -> Column:
    """Number of matches of one PII pattern (pre-redaction)."""
    if kind not in PII_PATTERNS:
        raise ValueError(f"unknown PII kind: {kind!r}")
    return F.regexp_count(_col(c), F.lit(PII_PATTERNS[kind]))
