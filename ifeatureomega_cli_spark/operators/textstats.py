"""Text analysis operators: quality scoring, token counting, language ID,
document fingerprinting.  Built-in column expressions wherever possible —
the whole module is JVM-side except nothing; zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# minimal stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "pour", "que", "une"],
    "es": ["el", "la", "de", "que", "los", "por", "con", "una", "del", "las"],
}


def text_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Per-document quality features: lengths, word stats, symbol ratios.

    Used as pre-training filters (drop too-short / symbol-heavy docs).
    `keep_text=True` passes the text column through — for pipelines that
    filter on the stats and keep processing the text (e.g. the streaming
    quality-gate → dedup composition)."""
    words = F.split(F.trim(F.col(text_col)), "\\s+")
    n_chars = F.length(text_col)
    n_words = F.size(words)
    n_alpha = F.length(F.regexp_replace(text_col, "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace(text_col, "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text_col, "[^.,;:!?'\"()]", ""))
    n_space = F.length(F.regexp_replace(text_col, "[^ ]", ""))
    return df.select(
        F.col(id_col),
        *([F.col(text_col)] if keep_text else []),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        (n_chars / F.greatest(n_words, F.lit(1))).alias("mean_word_len"),
        (n_alpha / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        (n_digit / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (n_punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (n_space / F.greatest(n_chars, F.lit(1))).alias("space_ratio"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        (F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1))
         ).alias("distinct_word_ratio"),
    )


def token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace tokens plus a BPE-ish subword estimate.

    The BPE-ish estimate counts regex word pieces (letter runs, digit runs,
    punctuation singletons) — a deterministic proxy for tokenizer budget."""
    ws = F.size(F.split(F.trim(F.col(text_col)), "\\s+"))
    pieces = F.size(
        F.filter(
            F.split(F.col(text_col), r"(?![a-zA-Z0-9])|(?<![a-zA-Z0-9])"),
            lambda s: s != "",
        )
    )
    # ~4 chars/token heuristic as the third estimator
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        pieces.alias("n_subword_pieces"),
        F.ceil(F.length(text_col) / F.lit(4)).cast("long").alias("n_tokens_est"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-vote language heuristic: score = fraction of words that are
    stopwords of each language; argmax wins (ties → 'und' undetermined).

    Oracle caveat: the driver-side DuckDB oracle for this query mirrors the
    same stopword lists and tie-break order (__spark_entry__.py), so its
    green row verifies the implementation's determinism across engines —
    not an external ground truth.  That is inherent to any heuristic
    langid; treat accuracy claims separately from the oracle check."""
    words = F.split(F.lower(F.col(text_col)), "\\s+")
    n_words = F.greatest(F.size(words), F.lit(1))
    scores = {
        lang: (F.size(F.filter(words, lambda w: w.isin(sw))) / n_words)
        for lang, sw in _STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    lang_col = F.lit("und")
    for lang in reversed(list(scores)):
        lang_col = F.when(scores[lang] == best, F.lit(lang)).otherwise(lang_col)
    lang_col = F.when(best <= 0.0, F.lit("und")).otherwise(lang_col)
    sel = [F.col(id_col), lang_col.alias("lang_pred")]
    sel += [scores[lang].alias(f"score_{lang}") for lang in scores]
    return df.select(*sel)


def fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    window: int = 8, digest: str = "xxhash64",
) -> DataFrame:
    """Winnowing-style document fingerprint: min rolling word-window hash.

    Two docs sharing long word runs collide; fully JVM-side (digest over
    sliding word windows via transform/slice).

    digest="xxhash64" (default): 64-bit int fingerprint, numeric min —
    the fast path.  digest="md5": lowercase-hex string fingerprint,
    LEXICOGRAPHIC min — ~2× the bytes, but md5 is engine-portable
    (DuckDB/Trino/Postgres compute the identical digest), which makes the
    whole winnowing pipeline cross-checkable value-for-value by an
    external SQL oracle; same plan shape either way."""
    if digest not in ("xxhash64", "md5"):
        raise ValueError("digest must be 'xxhash64' or 'md5'")
    words = F.split(F.lower(F.col(text_col)), "\\s+")
    h = (F.xxhash64 if digest == "xxhash64"
         else (lambda c: F.md5(c.cast("binary"))))
    hashes = F.filter(
        F.transform(
            words,
            lambda w, i: F.when(
                i <= F.size(words) - window,
                h(F.concat_ws(" ", F.slice(words, i + 1, window))),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return df.select(
        F.col(id_col),
        F.coalesce(F.array_min(hashes),
                   h(F.col(text_col))).alias("fingerprint"),
        F.size(hashes).alias("n_windows"),
    )
