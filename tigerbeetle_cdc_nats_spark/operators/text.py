"""Text-analysis operators for the training-data pipeline surface
(BASELINE.json north star): tokenization, language ID, quality scoring,
fingerprinting.

All pure Column expressions over the ``documents`` table (whitespace-joined
token text). Integer counts everywhere; doubles only as final deterministic
ratios of exact ints — keeps every output oracle-checkable.

Scale notes: these are embarrassingly parallel per-row maps — no shuffle at
all; they pipeline into the same stage as the parquet scan and stay inside
whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: BPE-ish word/number/punctuation tokenizer (identical RE2/Java semantics
#: for this ASCII class pattern).
REGEX_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

#: Per-language stopword profiles for the n-gram/stopword language-ID
#: heuristic. Deterministic tiebreak = alphabetical language order.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "y", "que", "los", "en", "un"),
    "fr": ("le", "la", "les", "et", "des", "un", "une", "dans"),
    "zh": ("de", "shi", "he", "zai", "le", "you", "wo", "ta"),
}
LANGS = tuple(sorted(STOPWORDS))  # alphabetical = tiebreak order


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (documents are single-space joined)."""
    return F.split(_col(text), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column | str,
                      pattern: str = REGEX_TOKEN_PATTERN) -> Column:
    """BPE-ish regex token count — words, numbers, punctuation marks."""
    return F.regexp_count(_col(text), F.lit(pattern))


def stopword_hits(text: Column | str, words: tuple[str, ...]) -> Column:
    """How many tokens (with repetition) are in ``words``."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def lang_scores(text: Column | str) -> list[Column]:
    """One stopword-hit count per language profile, aliased ``score_<lang>``."""
    return [
        stopword_hits(text, STOPWORDS[lang]).alias(f"score_{lang}")
        for lang in LANGS
    ]


def lang_pred(score_cols: dict[str, Column]) -> Column:
    """Argmax language with alphabetical tiebreak (first max wins)."""
    m = F.greatest(*score_cols.values())
    expr = F.when(score_cols[LANGS[0]] == m, F.lit(LANGS[0]))
    for lang in LANGS[1:]:
        expr = expr.when(score_cols[lang] == m, F.lit(lang))
    return expr


def doc_fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of the lowercased text (the deterministic
    stand-in for a rolling hash; a 60-bit integer form is
    ``fingerprint60``)."""
    return F.md5(F.lower(_col(text)))


def fingerprint60(text: Column | str) -> Column:
    """First 60 bits of the md5 as a BIGINT (join-friendly fingerprint)."""
    return F.conv(F.substring(F.md5(F.lower(_col(text))), 1, 15), 16, 10).cast("long")


def quality_score(text: Column | str) -> dict[str, Column]:
    """Deterministic quality features + composite score in [0,1]:
    uniqueness of vocabulary, non-stopword density, average token length.
    All derived from exact integer counts -> identical doubles everywhere.
    """
    t = _col(text)
    n_tok = token_count(t)
    n_chars = F.length(t)
    n_uniq = F.size(F.array_distinct(tokens(t)))
    n_stop = stopword_hits(t, STOPWORDS["en"])
    # tokens are single-space joined: total token chars = len - (n_tok - 1)
    avg_tok_len = (n_chars - (n_tok - 1)) / n_tok
    uniq_ratio = n_uniq / n_tok
    stop_ratio = n_stop / n_tok
    score = (
        uniq_ratio * 0.5
        + (1 - stop_ratio) * 0.3
        + F.least(avg_tok_len / 10.0, F.lit(1.0)) * 0.2
    )
    return {
        "n_tokens": n_tok.cast("bigint"),
        "n_uniq_tokens": n_uniq.cast("bigint"),
        "n_stopwords": n_stop.cast("bigint"),
        "avg_token_len": avg_tok_len,
        "uniq_ratio": uniq_ratio,
        "quality": score,
    }


# --- DuckDB oracle fragments (same arithmetic, SQL text) -------------------

def sql_tokens(expr: str = "text") -> str:
    return f"str_split({expr}, ' ')"


def sql_stopword_hits(lang: str, expr: str = "text") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({sql_tokens(expr)}, t -> t IN ({words})))"


def sql_quality(expr: str = "text") -> str:
    """DuckDB mirror of quality_score()['quality'] (same arithmetic order,
    so the composite double is bit-identical cross-engine)."""
    nt = f"len({sql_tokens(expr)})"
    return (
        f"(len(list_distinct({sql_tokens(expr)})) / {nt}) * 0.5"
        f" + (1 - {sql_stopword_hits('en', expr)} / {nt}) * 0.3"
        f" + LEAST(((length({expr}) - ({nt} - 1)) / {nt}) / 10.0, 1.0) * 0.2"
    )
