"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID, document fingerprinting.

These extend the engine beyond reference parity (BASELINE.json north star):
all pure built-in expressions — at 100 TB each is a map-only stage that
whole-stage-codegens, no Python in the hot path. Every operator has an
exact DuckDB-SQL twin for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql_duckdb,
)

# BPE-ish piece pattern: letter runs | digit runs | single non-space symbol
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
PUNCT_RE = r"[^A-Za-z0-9\s]"
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "de": ("der", "die", "und", "das", "nicht"),
    "fr": ("le", "la", "les", "et", "des"),
    "es": ("el", "los", "las", "que", "y"),
}


def tokens(c: Column) -> Column:
    """Whitespace tokenization; empty strings filtered (split artifacts)."""
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish piece count per document."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(tokens(t)).alias("n_tokens"),
        F.regexp_count(t, F.lit(BPE_RE)).alias("n_pieces"),
        F.length(t).alias("n_chars_actual"),
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals with a
    composite score in [0,1] (heuristics in the spirit of C4/Gopher rules).

    Ratios are rounded to 6 dp so the score is engine-portable.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    stop_hits = F.size(F.filter(toks, lambda x: F.lower(x).isin(*STOPWORDS)))
    punct = F.regexp_count(t, F.lit(PUNCT_RE))
    stop_ratio = F.round(stop_hits / n_tok, 6)
    punct_ratio = F.round(punct / n_chars, 6)
    mean_tok_len = F.round(
        F.aggregate(toks, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x))
        / n_tok,
        6,
    )
    len_ok = (n_tok >= 10) & (n_tok <= 1000)
    score = F.round(
        (
            F.when(len_ok, 0.4).otherwise(0.0)
            + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), 0.3).otherwise(0.0)
            + F.when(punct_ratio <= 0.2, 0.2).otherwise(0.0)
            + F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 12), 0.1).otherwise(0.0)
        ),
        2,
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count marker hits per language; CJK-character
    presence short-circuits to zh; ties broken by fixed language order."""
    t = F.col(text_col)
    toks = F.transform(tokens(t), lambda x: F.lower(x))
    scores = {
        lang: F.size(F.filter(toks, lambda x: x.isin(*marks)))
        for lang, marks in LANG_MARKERS.items()
    }
    cjk = F.regexp_count(t, F.lit(r"[一-鿿]"))
    # argmax with deterministic priority: first lang in order with max score
    order = ["en", "de", "fr", "es"]
    max_score = F.greatest(*[scores[lang] for lang in order])
    winner = F.lit("unknown")
    for lang in reversed(order):
        winner = F.when(
            (scores[lang] == max_score) & (max_score >= 1), F.lit(lang)
        ).otherwise(winner)
    pred = F.when(cjk > 0, F.lit("zh")).otherwise(winner)
    return docs.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in order],
        pred.alias("pred_lang"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", k: int = 24) -> DataFrame:
    """Document fingerprint: min/max rolling k-gram hash over the normalized
    text (winnowing-style selection reduced to global min — deterministic and
    set-stable under reordering of equal-content docs)."""
    t = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    # dynamic-start substring needs SQL transform (Column API substring takes
    # a literal start)
    grams = F.expr(
        f"transform(sequence(1, greatest(length({_norm_sql(text_col)}) - {k - 1}, 1)), "
        f"i -> substring({_norm_sql(text_col)}, i, {k}))"
    )
    hashes = F.transform(grams, portable_hash64)
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        portable_hash64(t).alias("fp_full"),
    )


def _norm_sql(text_col: str) -> str:
    return f"lower(regexp_replace({text_col}, '\\\\s+', ' '))"


# ----------------------------------------------------------- DuckDB oracles


def token_counts_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
      len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_tokens,
      len(regexp_extract_all(text, '{BPE_RE}')) AS n_pieces,
      length(text) AS n_chars_actual
    FROM {table}"""


def quality_features_sql(table: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
    WITH base AS (
      SELECT doc_id, text,
        list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks,
        length(text) AS n_chars
      FROM {table}
    ), feats AS (
      SELECT doc_id, len(toks) AS n_tokens,
        round(len(list_filter(toks, t -> lower(t) IN ({stop_list}))) * 1.0 / len(toks), 6) AS stop_ratio,
        round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0 / n_chars, 6) AS punct_ratio,
        round(list_sum(list_transform(toks, t -> length(t) * 1.0)) / len(toks), 6) AS mean_tok_len
      FROM base
    )
    SELECT doc_id, n_tokens, stop_ratio, punct_ratio, mean_tok_len,
      round(
        (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)
        + (CASE WHEN stop_ratio BETWEEN 0.05 AND 0.6 THEN 0.3 ELSE 0.0 END)
        + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
        + (CASE WHEN mean_tok_len BETWEEN 2.5 AND 12 THEN 0.1 ELSE 0.0 END), 2)
      AS quality_score
    FROM feats"""


def lang_id_sql(table: str = "documents") -> str:
    score_exprs = {
        lang: (
            f"len(list_filter(list_transform(list_filter(string_split_regex(text,"
            f" '\\s+'), t -> t <> ''), t -> lower(t)), t -> t IN "
            f"({', '.join(repr(m) for m in marks)})))"
        )
        for lang, marks in LANG_MARKERS.items()
    }
    order = ["en", "de", "fr", "es"]
    max_expr = f"greatest({', '.join(f'score_{lang}' for lang in order)})"
    winner = "'unknown'"
    for lang in reversed(order):
        winner = (
            f"CASE WHEN score_{lang} = mx AND mx >= 1 THEN '{lang}' ELSE {winner} END"
        )
    selects = ", ".join(f"{e} AS score_{lang}" for lang, e in score_exprs.items())
    return f"""
    WITH s AS (SELECT doc_id, text, {selects} FROM {table}),
    m AS (SELECT *, {max_expr} AS mx,
                 len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS cjk
          FROM s)
    SELECT doc_id, score_en, score_de, score_fr, score_es,
      CASE WHEN cjk > 0 THEN 'zh' ELSE {winner} END AS pred_lang
    FROM m"""


def fingerprint_sql(table: str = "documents", k: int = 24) -> str:
    norm = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
    gram = f"substring({norm}, i, {k})"
    h = portable_hash64_sql_duckdb(gram)
    full_h = portable_hash64_sql_duckdb(norm)
    return f"""
    SELECT doc_id,
      list_min(list_transform(range(1, greatest(length({norm}) - {k - 1}, 1) + 1),
               i -> {h})) AS fp_min,
      list_max(list_transform(range(1, greatest(length({norm}) - {k - 1}, 1) + 1),
               i -> {h})) AS fp_max,
      {full_h} AS fp_full
    FROM {table}"""
