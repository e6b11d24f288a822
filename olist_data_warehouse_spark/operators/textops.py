"""Text-analysis operators over a document table, Catalyst-native.

Every function here is a *column expression* built from
``pyspark.sql.functions`` only — no Python UDFs — so text analytics at
100 TB runs inside whole-stage codegen with full pushdown. Each has an
exact DuckDB-SQL twin (see plans/queries.py) built from the same
portable primitives:

- whitespace tokenization: ``split(trim(x), '\\s+')``
- portable 32-bit hash: first 8 hex digits of md5, parsed as int —
  identical in Spark (``conv(_,16,10)``) and DuckDB (``('0x'||_)::BIGINT``)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately small and fixed: the operator
# contract is "deterministic heuristic", not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
}
# Deterministic tie-break: fixed priority order.
LANG_PRIORITY = ("en", "de", "es", "fr")

STOPWORDS = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))


# Code points where JVM and DuckDB (utf8proc) lowercase DISAGREE —
# found by tools/unicode_fuzz_sweep.py and then a full BMP scan of
# Python/JVM str.lower vs DuckDB lower():
# - U+0130 İ: full case mapping EXPANDS to 'i' + U+0307 combining dot
#   on the JVM; utf8proc's simple mapping gives plain 'i'. Pinned to
#   the simple mapping (pre-translate before lower).
# - Eight rare Latin-extended capitals (U+2C2F, U+A7C0/C7/C9/D0/D6/D8,
#   U+A7F5) that utf8proc's older Unicode tables do not lower at all;
#   they round-trip through private-use sentinels so lower() leaves
#   them uppercase, matching DuckDB.
# - Greek capital sigma U+03A3: the JVM applies the CONTEXTUAL
#   SpecialCasing rule (word-final Σ → ς); utf8proc's simple mapping
#   is always σ. Pre-existing ς is protected through a sentinel, any
#   ς CREATED by lower() must come from the contextual rule and is
#   rewritten to σ, then the protected originals are restored —
#   DuckDB keeps input ς as ς, so both paths agree.
_LOWER_PREFOLD_SRC = "İΣ"
_LOWER_PREFOLD_DST = "iσ"
# Eight rare Latin-extended capitals (U+2C2F, U+A7C0/C7/C9/D0/D6/D8,
# U+A7F5 — Unicode 13+ additions) that DuckDB's utf8proc tables do not
# lower while the JVM does. Pinning them costs a second translate pass
# (+45% measured on tokenizer-heavy queries, vs ~10% for the single
# fused pass below) for characters that are practically nonexistent in
# any corpus — so they are a DOCUMENTED divergence, asserted as such by
# the parity test, not silently wrong.
KNOWN_LOWER_DIVERGENT = "ⰯꟀꟇꟉꟐꟖꟘꟵ"


def portable_lower(col: Column | str) -> Column:
    """lowercase pinned BYTE-IDENTICAL across Spark (JVM full case
    mapping) and DuckDB (utf8proc simple mapping) for every divergence
    that can plausibly occur — so md5 fingerprints, shingle hashes,
    token sorts, and edit distances agree (tools/unicode_fuzz_sweep.py
    is the gate). ONE fused pre-translate:

    - U+0130 İ: the JVM's full mapping EXPANDS it to i + U+0307;
      utf8proc's simple mapping gives plain i. Pre-folds to i.
    - U+03A3 Σ: the JVM applies the CONTEXTUAL word-final Σ→ς
      SpecialCasing rule; utf8proc is always σ. Pre-folding Σ→σ kills
      the contextual rule at the source (it can only fire on a Σ that
      reaches lower()), and input ς passes through lower() unchanged
      on BOTH engines — no sentinel round-trip needed.

    The only remaining divergence is :data:`KNOWN_LOWER_DIVERGENT` —
    eight Unicode-13+ capitals utf8proc cannot lower — documented and
    test-asserted rather than paid for on the hot path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.translate(c, _LOWER_PREFOLD_SRC, _LOWER_PREFOLD_DST)
    )


def normalize_text(col: Column | str) -> Column:
    """portable_lower + trim + collapse runs of whitespace to single
    spaces."""
    return F.regexp_replace(portable_lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BIGINT to match DuckDB len())."""
    return F.size(tokens(col)).cast("long")


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-ish token-count estimate: ceil(chars/4) — the standard
    subword rule of thumb, portable to any engine."""
    return F.ceil(F.length(normalize_text(col)) / F.lit(4.0)).cast("long")


def portable_hash32(col: Column | str) -> Column:
    """Deterministic 32-bit hash identical across Spark and DuckDB:
    int value of the first 8 hex digits of md5."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text. Whitespace or
    case changes don't alter it; any content change does."""
    return F.md5(normalize_text(col))


# Rabin-Karp rolling-hash parameters. BASE 31 / a large prime modulus is
# the classic polynomial hash; MOD < 2^30 keeps acc*31+h inside BIGINT.
ROLL_BASE = 31
ROLL_MOD = 1_000_000_007


def rolling_hash(col: Column | str) -> Column:
    """Polynomial (Rabin-Karp) rolling hash over the token stream:

        h = fold(tokens, 0, (acc, t) -> (acc*BASE + hash32(t)) % MOD)

    Order-sensitive (unlike a bag-of-words digest) and incrementally
    maintainable — appending a token is O(1), which is what makes it a
    *rolling* fingerprint. Pure ``F.aggregate`` over the token array:
    JVM-side, no UDF, no shuffle, scale-free per row.
    """
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * ROLL_BASE + portable_hash32(t) % 2147483647)
        % ROLL_MOD,
    )


def stopword_count(col: Column | str) -> Column:
    toks = tokens(col)
    arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (the language-ID signal)."""
    toks = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in markers])
        out[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, t))
        ).cast("long")
    return out


def lang_id(col: Column | str) -> Column:
    """Argmax language with fixed-priority tie-break; 'und' if no
    marker hits at all."""
    scores = lang_scores(col)
    best = F.greatest(*[scores[lang] for lang in LANG_PRIORITY])
    expr = F.lit("und")
    # Build CASE from lowest to highest priority so the highest-priority
    # language wins equal scores.
    for lang in reversed(LANG_PRIORITY):
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def punct_count(col: Column | str) -> Column:
    """Count of non-alphanumeric, non-space characters."""
    stripped = F.regexp_replace(normalize_text(col), r"[a-z0-9 ]", "")
    return F.length(stripped).cast("long")


def quality_features(col: Column | str) -> dict[str, Column]:
    """Deterministic quality signals: token count, mean token length,
    stopword ratio, punctuation ratio. All rounded for cross-engine
    float stability."""
    n_tok = token_count(col)
    n_chr = F.length(normalize_text(col)).cast("long")
    return {
        "n_tokens": n_tok,
        "n_chars_norm": n_chr,
        "mean_token_len": F.round(
            (n_chr - (n_tok - F.lit(1))) / n_tok.cast("double"), 4
        ),
        "stopword_ratio": F.round(stopword_count(col) / n_tok.cast("double"), 4),
        "punct_ratio": F.round(punct_count(col) / n_chr.cast("double"), 4),
    }


# PII patterns, deliberately restricted to syntax shared by Java regex
# (Spark) and RE2 (DuckDB): char classes, bounded repeats, \d, \b.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-doc PII occurrence counts (emails, phone-shaped numbers) as
    Catalyst ``regexp_count`` expressions — the scan stays codegen'd."""
    return {
        "n_emails": F.regexp_count(col, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(col, F.lit(PHONE_RE)).cast("long"),
    }


def pii_redact(col: Column | str) -> Column:
    """Text with emails → ``<EMAIL>`` and phone-shaped numbers →
    ``<PHONE>``. Order matters (emails first: a phone regex can never
    match inside an email with these patterns, but fixing the order
    keeps the twin byte-identical)."""
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def repetition_features(col: Column | str) -> dict[str, Column]:
    """Within-document repetition signals (the Gopher-style quality
    filter): fraction of duplicate tokens and duplicate 3-word
    shingles. Pure array expressions — no explode, no shuffle; each
    document is scored independently inside codegen."""
    toks = tokens(col)
    sh = word_shingles(col, 3)
    return {
        "dup_token_ratio": F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(toks)) / F.size(toks).cast("double"),
            4,
        ),
        "dup_shingle_ratio": F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(sh)) / F.size(sh).cast("double"),
            4,
        ),
    }


def shingles_from_tokens(toks: Column, norm: Column, k: int = 3) -> Column:
    """Contiguous k-word shingles from a *materialized* tokens column.

    Prefer this over :func:`word_shingles` whenever the tokens can be
    computed in a prior (exchange-separated) projection: the lambda then
    reads an attribute instead of re-running the tokenizer per element.
    Documents shorter than k words yield one whole-text shingle.
    """
    n = F.size(toks)
    joined = F.transform(
        F.sequence(F.lit(1), n - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(n >= k, joined).otherwise(F.array(norm))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Contiguous k-word shingles (array<string>) of the normalized
    text — the unit set for Jaccard/MinHash dedup. Convenience form of
    :func:`shingles_from_tokens` computing tokens inline."""
    return shingles_from_tokens(tokens(col), normalize_text(col), k)
