"""Text analysis operators: token stats, quality scoring, language ID,
fingerprinting. All pure built-in expressions (codegen'd; no UDFs), each
designed so an ANSI-SQL oracle can reproduce it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# token pattern: word | number | single non-space symbol (BPE-ish split)
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword marker sets for the n-gram-free heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "les", "des", "et", "une"],
}


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace tokens + regex (BPE-ish) tokens per document.

    Returns: id_col, ws_tokens (int), re_tokens (int), n_chars (int).
    """
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    re_count = F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0)))
    return df.select(
        F.col(id_col),
        ws.cast("int").alias("ws_tokens"),
        re_count.cast("int").alias("re_tokens"),
        F.length(text_col).cast("int").alias("n_chars"),
    )


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality features used by pretraining-data filters:
    token count, mean token length, distinct-token ratio, alpha ratio.

    Returns: id_col, n_tokens, mean_tok_len, uniq_ratio, alpha_ratio,
    quality (all double, rounded to 6 dp for cross-engine stability).
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tokens = F.size(words).cast("double")
    n_chars = F.length(text_col).cast("double")
    mean_tok_len = (
        (n_chars - (n_tokens - 1)) / n_tokens
    )  # chars minus separators, per token
    uniq_ratio = F.size(F.array_distinct(words)).cast("double") / n_tokens
    alpha_chars = F.length(F.regexp_replace(text_col, r"[^A-Za-z]", "")).cast("double")
    alpha_ratio = alpha_chars / n_chars
    quality = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.3
        + uniq_ratio * 0.4
        + alpha_ratio * 0.3
    )
    return df.select(
        F.col(id_col),
        F.round(n_tokens, 6).alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(uniq_ratio, 6).alias("uniq_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def _marker_count(text_col: str, markers: list[str]) -> Column:
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pattern), F.lit(0))
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Stopword-marker language ID: score each language by marker-word
    hits, predict the argmax (ties: alphabetical language order, then
    'und' — undetermined — when no marker hits at all).

    Returns: id_col, pred_lang, plus score_<lang> columns (int).
    """
    scores = {
        lang: _marker_count(text_col, markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    scored = df.select(F.col(id_col), *scores.values())
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier languages win ties
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.select(
        id_col, pred.alias("pred_lang"), *[f"score_{l}" for l in langs]
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercased, whitespace collapsed). Identical fingerprints <=> exact
    duplicates under normalization.

    Returns: id_col, fp (32-char hex string).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))
