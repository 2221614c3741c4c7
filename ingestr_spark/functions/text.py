"""Text-analysis primitives for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (regexp + arithmetic) — whole-stage-codegen'd,
no Python in the hot path, and each is mirrored exactly by a DuckDB oracle
(counts are integers; ratios are single double divisions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword probes for the n-gram heuristic; word-boundary
# regexes so "the" doesn't fire inside "theory"
LANG_PROBES: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|was|that)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein)\b",
    "es": r"\b(el|la|los|las|es|una|que|para)\b",
    "fr": r"\b(le|la|les|est|une|dans|pour|avec)\b",
}
# CJK unified ideographs — presence dominates the latin probes
ZH_PROBE = r"[一-鿿]"

WORD_RE = r"[A-Za-z]+"
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}\-]"

FINGERPRINT_MOD = 1_000_000_000_039  # < 2^40: 31*M + tok stays < 2^63


def whitespace_token_count(text) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.regexp_count(text, F.lit(BPE_ISH_RE))


def word_count(text) -> Column:
    return F.regexp_count(text, F.lit(WORD_RE))


def punct_count(text) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_RE))


def lang_scores(text) -> dict[str, Column]:
    out = {k: F.regexp_count(text, F.lit(v)) for k, v in LANG_PROBES.items()}
    # weight ideograph hits heavily: one CJK char is stronger evidence than
    # one stopword
    out["zh"] = F.regexp_count(text, F.lit(ZH_PROBE)) * 3
    return out


def lang_id(text) -> Column:
    """Argmax of probe scores with a fixed tie order (en,de,es,fr,zh);
    all-zero scores -> 'und'."""
    scores = lang_scores(text)
    order = ["en", "de", "es", "fr", "zh"]
    best_score = F.greatest(*[scores[k] for k in order])
    expr = F.lit("und")
    for k in reversed(order):  # earlier languages win ties
        expr = F.when((scores[k] == best_score) & (best_score > 0), F.lit(k)).otherwise(expr)
    return expr


def quality_score(text) -> Column:
    """Heuristic [0,1] quality: length band + punctuation ratio band +
    word-shape ratio. Deterministic integer counts -> exact everywhere."""
    n_chars = F.length(text)
    n_words = word_count(text)
    n_punct = punct_count(text)
    n_ws = whitespace_token_count(text)
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    punct_ok = F.when(punct_ratio <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
    word_ratio = n_words.cast("double") / F.greatest(n_ws, F.lit(1))
    shape_ok = F.when(word_ratio >= 0.8, F.lit(0.3)).otherwise(F.lit(0.0))
    return len_ok + punct_ok + shape_ok


def token_fingerprint(tokens_col) -> Column:
    """Order-sensitive rolling hash over the token array:
    fp = fold(tokens, 0, (a, t) -> (a*31 + t) % M). Documents differing only
    in token order get different prints (unlike a sum)."""
    return F.aggregate(
        tokens_col,
        F.lit(0).cast("long"),
        lambda a, x: (a * 31 + x.cast("long")) % FINGERPRINT_MOD,
    )
