"""Text-analysis expression builders for the `documents` table (north-star
LLM-pipeline surface): tokenization, normalization, fingerprinting,
language-ID scoring, quality features. All pure Catalyst expressions —
at 100 TB these run inside whole-stage codegen in the scan stage, with no
Python in the loop.

Every builder has a DuckDB twin so operators can register exact oracles;
the two sides are kept textually adjacent here to stay in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the heuristic language-ID
# (deliberately minimal: the operator demonstrates the scalable shape —
# marker-hit scoring + argmax — not lexicography).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
    "zh": ("de", "shi", "le"),
}


def tokens(col: str = "text") -> Column:
    """Whitespace tokens, empties removed (matches `tokens_sql`)."""
    return F.filter(F.split(F.col(col), " "), lambda t: t != "")


def tokens_sql(col: str = "text") -> str:
    """DuckDB twin of :func:`tokens`."""
    return f"list_filter(string_split({col}, ' '), t -> t <> '')"


def normalized(col: str = "text") -> Column:
    """Canonical form for fingerprinting: lowercase, whitespace collapsed,
    trimmed."""
    return F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))


def normalized_sql(col: str = "text") -> str:
    return f"lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"


def fingerprint(col: str = "text") -> Column:
    """16-hex-char document fingerprint over the normalized text (md5 is
    identical across engines; 64 bits is plenty below ~2^32 docs)."""
    return F.substring(F.md5(normalized(col)), 1, 16)


def fingerprint_sql(col: str = "text") -> str:
    return f"substring(md5({normalized_sql(col)}), 1, 16)"


def marker_hits(lang: str, col: str = "text") -> Column:
    """Count of language-marker words present (0..3) — the language-ID
    score for one language."""
    padded = F.concat(F.lit(" "), F.col(col), F.lit(" "))
    score = F.lit(0)
    for m in LANG_MARKERS[lang]:
        score = score + F.when(padded.like(f"% {m} %"), 1).otherwise(0)
    return score


def marker_hits_sql(lang: str, col: str = "text") -> str:
    padded = f"(' ' || {col} || ' ')"
    terms = " + ".join(
        f"(CASE WHEN {padded} LIKE '% {m} %' THEN 1 ELSE 0 END)"
        for m in LANG_MARKERS[lang]
    )
    return f"({terms})"


def bigram_shingles(toks_col: str = "toks") -> Column:
    """Distinct word-bigram shingles from an already-projected token
    ARRAY column. Takes a COLUMN NAME, not the raw `tokens()` expression:
    referencing that expression here would re-run split+filter at every
    `element_at` (O(tokens²) per doc — the round-3/4 recompute lesson).
    Empty-safe: < 2 tokens yields an empty array (Spark's `sequence`
    counts DOWN when start > stop, so the guard is load-bearing).

    This is the ONE shingle definition shared by the MinHash candidate
    generator, the signature store, and the ngram-Jaccard verification
    measure — candidate generation and verification MUST score the same
    feature space (round 4's `ext_dedup_recall_eval` caught them
    diverging: unigram-set MinHash collapsed into degenerate LSH buckets
    on the small unigram vocabulary and the bucket cap silently dropped
    j≈0.99 true pairs; recall 7/52)."""
    tk = F.col(toks_col)
    return F.when(
        F.size(tk) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(tk, i), F.element_at(tk, i + 1)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
