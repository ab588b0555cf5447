"""Text-analysis functions for large-scale training-data pipelines.

Beyond the reference's surface (it has no text ops) — these are the
first-class extension ops (SURVEY §7.2 step 6): tokenization, quality
scoring, language-ID heuristic, document fingerprinting. All pure column
compositions (JVM-side, codegen'd); no Python UDFs in the hot path.

Cross-engine determinism: the shared 64-bit hash primitive ``h64`` is
"integer value of the first 15 hex chars of md5" — expressible identically
in Spark (``conv(substr(md5(s),1,15),16,10)``) and DuckDB
(``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``), 60 bits so it always
fits a signed long.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The engine's canonical whitespace tokenizer and "BPE-ish" token pattern.
WS_SPLIT = r"\s+"
BPE_PATTERN = r"[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

# Stopword markers per language for the n-gram language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "of", "to", "and"),
    "es": ("el", "la", "los", "y", "de", "que"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在"),
}
# Deterministic argmax tie-break order (first wins on equal scores).
LANG_ORDER = ("en", "es", "de", "fr", "zh")

STOPWORDS = LANG_MARKERS["en"]


def h64(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (see module docstring)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h64_py(s: str) -> int:
    """Driver-side twin of :func:`h64` — same value for the same string,
    used to derive constants (LSH hyperplanes, minhash permutations) that
    SQL oracles embed as literals."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def tokens(col: Column | str) -> Column:
    """Whitespace tokens; leading/trailing space trimmed so no empty tokens."""
    return F.split(F.trim(col), WS_SPLIT)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (letters runs / digit runs / single
    punctuation) — the standard cheap proxy for subword token count."""
    return F.regexp_count(F.col(col) if isinstance(col, str) else col,
                          F.lit(BPE_PATTERN)).cast("long")


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    quoted = ", ".join(f"'{m}'" for m in markers)
    return F.expr(f"size(filter(__toks, t -> t in ({quoted})))").cast("long")


def with_lang_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Language-ID heuristic: per-language stopword-marker hit ratio, and
    the argmax prediction with a fixed tie-break order."""
    out = df.withColumn("__toks", tokens(text_col))
    n = F.greatest(F.size("__toks").cast("long"), F.lit(1))
    score_cols = {}
    for lang in LANG_ORDER:
        score_cols[f"score_{lang}"] = (
            _marker_hits(F.col("__toks"), LANG_MARKERS[lang]) / n
        )
    out = out.withColumns(score_cols)
    # argmax with LANG_ORDER tie-break: strictly-greater chain
    best = F.lit(LANG_ORDER[0])
    best_score = F.col(f"score_{LANG_ORDER[0]}")
    for lang in LANG_ORDER[1:]:
        cond = F.col(f"score_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"score_{lang}")).otherwise(best_score)
    return out.withColumn("pred_lang", best).drop("__toks")


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Document quality scoring: length, token stats, stopword/punct ratios,
    and a composite [0,1] score. Deterministic double arithmetic (IEEE
    division — oracle-exact)."""
    out = df.withColumn("__toks", tokens(text_col))
    n_tok = F.size("__toks").cast("long")
    n_chars = F.length(text_col).cast("long")
    safe_tok = F.greatest(n_tok, F.lit(1))
    quoted = ", ".join(f"'{m}'" for m in STOPWORDS)
    stop_hits = F.expr(f"size(filter(__toks, t -> t in ({quoted})))").cast("long")
    punct = F.regexp_count(
        F.col(text_col), F.lit(r"[^a-zA-Z0-9\s]")
    ).cast("long")
    out = out.withColumns(
        {
            "n_chars_f": n_chars,
            "n_tokens": n_tok,
            "avg_token_len": (n_chars - (n_tok - 1)) / safe_tok,
            "stopword_ratio": stop_hits / safe_tok,
            "punct_ratio": punct / F.greatest(n_chars, F.lit(1)),
        }
    )
    score = (
        F.lit(0.5) * F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - F.col("stopword_ratio"))
        + F.lit(0.2) * F.least(F.lit(1.0), F.col("avg_token_len") / F.lit(8.0))
    )
    return out.withColumn("quality_score", score).drop("__toks")


# Characters whose density separates code from prose; the class is
# restricted to syntax Java regex (Spark) and RE2 (DuckDB) read alike.
CODE_SYMBOL_CLASS = r"[{}()\[\];=<>]"


def code_features(df: DataFrame, text_col: str) -> DataFrame:
    """Code-vs-prose detection heuristics: density of code punctuation,
    digits, and line structure. All ratios are integer permille
    (``x·1000 div n``) — exact BIGINT math, no float thresholds, so the
    keep/flag boundary is bit-identical in any engine. Pure column
    expressions, no shuffle."""
    n_chars = F.length(text_col).cast("long")
    n_sym = (
        n_chars
        - F.length(F.regexp_replace(F.col(text_col), CODE_SYMBOL_CLASS, ""))
    ).cast("long")
    n_digit = (
        n_chars
        - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    ).cast("long")
    n_lines = F.size(F.split(F.col(text_col), "\n")).cast("long")
    out = df.withColumns(
        {
            "n_chars_c": n_chars,
            "n_symbols": n_sym,
            "n_digits": n_digit,
            "n_lines": n_lines,
        }
    )
    out = out.withColumns(
        {
            "symbol_permille": F.expr(
                "(n_symbols * 1000) div greatest(n_chars_c, 1)"
            ),
            "digit_permille": F.expr(
                "(n_digits * 1000) div greatest(n_chars_c, 1)"
            ),
        }
    )
    return out.withColumn(
        "is_code_like",
        (F.col("symbol_permille") >= 50) | (F.col("n_lines") > 10),
    )


def shingles_expr(tokens_col: str, n: int) -> Column:
    """Ordered n-token shingles as strings; a document shorter than ``n``
    tokens yields its whole text as the single shingle."""
    seq = (
        f"transform(sequence(0, size({tokens_col}) - {n}), "
        f"i -> concat_ws(' ', slice({tokens_col}, i + 1, {n})))"
    )
    whole = f"array(concat_ws(' ', {tokens_col}))"
    return F.expr(
        f"CASE WHEN size({tokens_col}) >= {n} THEN {seq} ELSE {whole} END"
    )


def fingerprint(df: DataFrame, text_col: str, shingle_size: int = 5) -> DataFrame:
    """Document fingerprint: min ``h64`` over rolling token shingles —
    a 1-permutation minhash, the standard content-defined fingerprint."""
    out = df.withColumn("__toks", tokens(text_col))
    out = out.withColumn("__sh", shingles_expr("__toks", shingle_size))
    fp = F.array_min(F.expr(
        "transform(__sh, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))"
    ))
    return out.withColumn("fingerprint", fp).drop("__toks", "__sh")


# PII scrubbing: the pattern set is deliberately restricted to syntax both
# Java regex (Spark) and RE2 (DuckDB) interpret identically — no
# lookaround, no backrefs, greedy leftmost quantifiers only — so the
# oracle replicates redaction byte-for-byte. Replacement order matters
# (emails contain dots that would otherwise partially match the IP rule).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ]{5,14}[0-9]", "<PHONE>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace every email / IPv4 / international-phone match with a typed
    placeholder token. Pure chained ``regexp_replace`` — JVM-side,
    per-row, no shuffle; the standard pre-training scrub step."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (columns named ``n_<category>``)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.regexp_count(c, F.lit(pattern)).cast("long")
        for name, pattern, _ in PII_PATTERNS
    }
