"""Text-analysis functions for training-data pipelines.

All hot-path functions are built-in Column expressions (JVM, codegen) —
no Python in the loop. Designed for the ``documents`` table shape
(doc_id, text, lang, source, n_chars) at 100 TB: every function is a
narrow projection over ``text`` so Parquet column pruning keeps the scan
to the columns used.

Operators: tokenization stats, quality scoring, language-ID heuristic,
document fingerprinting (normalization + hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered stopword lists for the n-gram-free language heuristic: a text
# votes for the language with the most stopword hits. Tiny and fast —
# the scale path is the JVM regexp engine, not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "are"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "für"],
    "fr": ["le", "la", "et", "les", "des", "est", "dans", "pour", "que", "une"],
    "id": ["yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "ke"],
}


def normalize_text(c: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace,
    strip. (The reference's strip semantics, transform.py:86-89, taken to
    its dedup-ready conclusion.)"""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Whitespace/punct tokenization → array<string>. BPE-ish in that
    punctuation splits off; pure regex so it stays JVM-side."""
    return F.filter(
        F.split(F.lower(c), r"[^\p{L}\p{N}]+"), lambda t: t != F.lit("")
    )


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


# GPT-2-style pre-tokenizer pattern, restricted to the Java-regex ∩ RE2
# common subset (no lookahead): contraction suffixes, space-prefixed
# letter/digit runs, space-prefixed punctuation runs, whitespace runs.
BPE_PRETOKEN_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}']+|\s+"
)


def bpe_pretokens(c: Column) -> Column:
    """BPE-ish pre-tokenization (the GPT-2 regex family): the token
    boundaries a byte-pair-encoding tokenizer merges within. Whitespace
    runs are dropped from the result (they carry no merge content).
    Pure JVM regex — identical matches in RE2 (DuckDB oracle)."""
    return F.filter(
        F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), 0),
        lambda t: ~t.rlike(r"^\s+$"),
    )


def bpe_pretoken_count(c: Column) -> Column:
    return F.size(bpe_pretokens(c))


def char_len(c: Column) -> Column:
    return F.length(c)


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are punctuation-ish (non-alnum,
    non-space)."""
    stripped = F.regexp_replace(c, r"[\p{L}\p{N}\s]", "")
    return F.when(
        F.length(c) > 0, F.length(stripped).cast("double") / F.length(c)
    ).otherwise(F.lit(0.0))


def stopword_hits(c: Column, lang: str = "en") -> Column:
    toks = tokens(c)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    n = token_count(c)
    return F.when(n > 0, stopword_hits(c, lang).cast("double") / n).otherwise(
        F.lit(0.0)
    )


def quality_score(c: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    stopword presence. Deterministic arithmetic only (oracle-checkable)."""
    n_tok = token_count(c)
    len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    sw_score = F.least(stopword_ratio(c, "en") * 5, F.lit(1.0))
    return F.round(
        len_score * 0.4 + punct_score * 0.3 + sw_score * 0.3, 6
    )


def lang_guess(c: Column) -> Column:
    """Argmax of per-language stopword hits; ties and zero hits → 'und'.
    Deterministic tie-break: language order en, de, fr, id (strictly-
    greater comparison keeps the earlier language on ties)."""
    hits = {lang: stopword_hits(c, lang) for lang in STOPWORDS}
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in STOPWORDS:  # insertion order = priority order
        is_better = hits[lang] > best_hits
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(is_better, hits[lang]).otherwise(best_hits)
    return best_lang


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    md5 (not xxhash) so the DuckDB oracle computes the identical value."""
    return F.md5(normalize_text(c))


# PII patterns, written to behave identically under Java regex (Spark)
# and RE2 (DuckDB): no lookaround, no backrefs, explicit classes only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+\d[\d-]{6,}\d",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(c: Column, kind: str) -> Column:
    """Occurrences of one PII pattern — JVM ``regexp_count``."""
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind]))


def redact_pii(c: Column) -> Column:
    """Scrub emails / phone numbers / IPv4 addresses to typed placeholder
    tokens — the pre-training privacy pass. Pure ``regexp_replace`` chain
    (JVM, codegen); order matters: emails first so their host part isn't
    half-eaten by the IP rule."""
    out = F.regexp_replace(c, PII_PATTERNS["email"], "<EMAIL>")
    out = F.regexp_replace(out, PII_PATTERNS["ipv4"], "<IP>")
    return F.regexp_replace(out, PII_PATTERNS["phone"], "<PHONE>")


def chunk_texts(c: Column, size: int = 10, stride: int = 5) -> Column:
    """Sliding token-window chunks as array<string> — the LLM-training
    chunking primitive (context-window packing). Chunk i covers tokens
    [i·stride, i·stride + size); the last window is allowed short; empty
    docs yield no chunks. Built-ins only, so chunking 100 TB of text
    never leaves whole-stage codegen."""
    toks = tokens(c)
    n = F.size(toks)
    i_max = F.ceil(
        F.greatest(n - size, F.lit(0)) / F.lit(float(stride))
    ).cast("int")
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), i_max),
            lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, size)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(c: Column, k: int = 3) -> Column:
    """k-word shingles as array<string> (distinct). The shingle set
    feeds n-gram Jaccard and MinHash. Built-ins only: split →
    sliding-window via transform over an index sequence."""
    toks = tokens(c)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingles = F.when(
        n >= k,
        F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(shingles)
