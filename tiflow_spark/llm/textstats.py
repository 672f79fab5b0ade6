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


def quality_score(t: Column) -> Column:
    """Composite quality score in [0,1] as a reusable Column (the funnel
    computes it inline on the corpus, avoiding a per-stage join)."""
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
    return F.round(
        (
            F.when(len_ok, 0.4).otherwise(0.0)
            + F.when((stop_ratio >= 0.05) & (stop_ratio <= 0.6), 0.3).otherwise(0.0)
            + F.when(punct_ratio <= 0.2, 0.2).otherwise(0.0)
            + F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 12), 0.1).otherwise(0.0)
        ),
        2,
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
    # normalize ONCE per row into a materialized column — inlining the
    # regexp_replace into the transform lambda would re-normalize the whole
    # string per array element (O(len²) per doc on long documents)
    normed = docs.withColumn(
        "_nt", F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    )
    # dynamic-start substring needs SQL transform (Column API substring takes
    # a literal start)
    grams = F.expr(
        f"transform(sequence(1, greatest(length(_nt) - {k - 1}, 1)), "
        f"i -> substring(_nt, i, {k}))"
    )
    hashes = F.transform(grams, portable_hash64)
    return normed.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
        portable_hash64(F.col("_nt")).alias("fp_full"),
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


# ------------------------------------------------------- repetition signals


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity (unlike dedup.word_shingles, which
    dedups) — repetition scoring needs the counts. Same shifted-array
    zip_with construction: O(words) array references, never the
    O(words²) indexed-lambda form."""
    toks = tokens(text)
    joined = toks
    for j in range(1, n):
        joined = F.zip_with(
            joined,
            F.slice(toks, j + 1, 2_000_000_000),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(joined, 1, F.greatest(F.size(toks) - (n - 1), F.lit(1)))


def repetitive_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic corpus with injected repetition: every 9th doc's text is
    replaced by its first 6 words repeated 10 times — gives the repetition
    signals real positives (the base word-soup corpus is repetition-free)."""
    t = F.col(text_col)
    first6 = F.array_join(F.slice(tokens(t), 1, 6), " ")
    rep = F.rtrim(F.repeat(F.concat(first6, F.lit(" ")), 10))
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 9 == 0, rep).otherwise(t).alias("text"),
    )


REPETITIVE_CORPUS_SQL = """
corpus AS (
  SELECT doc_id,
    CASE WHEN doc_id % 9 = 0 THEN rtrim(repeat(
      array_to_string(list_slice(
        list_filter(string_split_regex(text, '\\s+'), t -> t <> ''), 1, 6),
        ' ') || ' ', 10))
    ELSE text END AS text
  FROM documents
)"""


def repetition_features(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):

    - ``uniq_word_ratio``  distinct words / words (low ⇒ repetitive)
    - ``top2gram_char_frac``  max over 2-grams of count·len(gram) / chars
      (character mass of the most dominant bigram)
    - ``dup3gram_char_frac``  Σ count·len(gram) over 3-grams with count>1,
      / chars (character mass inside duplicated trigrams)
    - ``repetitive``  flag: uniq<0.3 OR dup3>0.2

    Two shuffles, both keyed by doc_id (gram counting, then per-doc fold) —
    no skew risk beyond document size itself; at 100 TB this is the same
    shape as any per-doc aggregation."""
    t = F.col(text_col)
    toks = tokens(t)
    base = docs.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias(
            "uniq_word_ratio"
        ),
        word_ngrams(t, 2).alias("g2"),
        word_ngrams(t, 3).alias("g3"),
    )
    ex = base.select(
        "doc_id",
        "n_chars",
        "uniq_word_ratio",
        F.explode(
            F.concat(
                F.transform(
                    F.col("g2"),
                    lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
                ),
                F.transform(
                    F.col("g3"),
                    lambda g: F.struct(F.lit(3).alias("n"), g.alias("gram")),
                ),
            )
        ).alias("g"),
    )
    counts = ex.groupBy(
        "doc_id",
        "n_chars",
        "uniq_word_ratio",
        F.col("g.n").alias("n"),
        F.col("g.gram").alias("gram"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    agg = counts.groupBy("doc_id", "n_chars", "uniq_word_ratio").agg(
        F.max(
            F.when(F.col("n") == 2, F.col("cnt") * F.length("gram"))
        ).alias("top2_chars"),
        F.sum(
            F.when(
                (F.col("n") == 3) & (F.col("cnt") > 1),
                F.col("cnt") * F.length("gram"),
            )
        ).alias("dup3_chars"),
    )
    top2 = F.round(
        F.coalesce(F.col("top2_chars"), F.lit(0)) / F.col("n_chars"), 6
    )
    dup3 = F.round(
        F.coalesce(F.col("dup3_chars"), F.lit(0)) / F.col("n_chars"), 6
    )
    return agg.select(
        "doc_id",
        "uniq_word_ratio",
        top2.alias("top2gram_char_frac"),
        dup3.alias("dup3gram_char_frac"),
        ((F.col("uniq_word_ratio") < 0.3) | (dup3 > 0.2)).alias("repetitive"),
    )


def _ngrams_sql(n: int, toks: str = "toks") -> str:
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 1) + 1),"
        f" i -> {parts})"
    )


def repetition_features_sql() -> str:
    return f"""WITH {REPETITIVE_CORPUS_SQL.strip()},
base AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM corpus
),
uw AS (
  SELECT doc_id, n_chars,
         round(len(list_distinct(toks)) * 1.0 / len(toks), 6)
           AS uniq_word_ratio,
         toks
  FROM base
),
g AS (
  SELECT doc_id, 2 AS n, unnest({_ngrams_sql(2)}) AS gram FROM uw
  UNION ALL
  SELECT doc_id, 3 AS n, unnest({_ngrams_sql(3)}) AS gram FROM uw
),
counts AS (
  SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3
),
agg AS (
  SELECT doc_id,
    max(CASE WHEN n = 2 THEN cnt * length(gram) END) AS top2_chars,
    sum(CASE WHEN n = 3 AND cnt > 1 THEN cnt * length(gram) END)
      AS dup3_chars
  FROM counts GROUP BY 1
)
SELECT u.doc_id AS doc_id, uniq_word_ratio,
  round(coalesce(top2_chars, 0) * 1.0 / n_chars, 6) AS top2gram_char_frac,
  round(coalesce(dup3_chars, 0) * 1.0 / n_chars, 6) AS dup3gram_char_frac,
  (uniq_word_ratio < 0.3
   OR round(coalesce(dup3_chars, 0) * 1.0 / n_chars, 6) > 0.2)
    AS repetitive
FROM uw u LEFT JOIN agg a ON u.doc_id = a.doc_id"""


# --------------------------------------------------- token-rarity signals


def token_rarity(
    docs: DataFrame, text_col: str = "text", rare_df: int = 5
) -> DataFrame:
    """Corpus-grounded rarity signals per document.

    Builds the corpus document-frequency table (distinct tokens per doc →
    docs per token), then scores each document by how much of its
    vocabulary is rare: ``rare_ratio`` = distinct tokens with df <
    ``rare_df`` / distinct tokens, and ``mean_df_r`` = mean document
    frequency of its tokens. High rare_ratio flags OCR noise / gibberish /
    boilerplate-free outliers; abnormally high mean_df flags template text.

    Scale shape: the df table is vocabulary-sized (≪ corpus) and the join
    back is token-keyed — two shuffles, both with map-side combine. All
    arithmetic stays in integer space until one final division + round, so
    the DuckDB twin matches bit-exactly (no float accumulation order).
    """
    t = F.col(text_col)
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(tokens(F.lower(t)))).alias("tok"),
    )
    df_tbl = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    per_doc = (
        toks.join(df_tbl, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.when(F.col("df") < rare_df, 1).otherwise(0)).alias(
                "rare_cnt"
            ),
            F.sum("df").alias("df_sum"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_distinct",
        "rare_cnt",
        F.round(F.col("rare_cnt") / F.col("n_distinct"), 6).alias("rare_ratio"),
        F.round(F.col("df_sum") / F.col("n_distinct"), 6).alias("mean_df_r"),
    )


def token_rarity_sql(table: str = "documents", rare_df: int = 5) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(
        list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')))
        AS tok
      FROM {table}
    ), dfreq AS (
      SELECT tok, count(*) AS df FROM toks GROUP BY 1
    ), per_doc AS (
      SELECT doc_id,
        count(*) AS n_distinct,
        sum(CASE WHEN df < {rare_df} THEN 1 ELSE 0 END) AS rare_cnt,
        sum(df) AS df_sum
      FROM toks JOIN dfreq USING (tok) GROUP BY 1
    )
    SELECT doc_id, n_distinct,
      CAST(rare_cnt AS BIGINT) AS rare_cnt,
      round(rare_cnt * 1.0 / n_distinct, 6) AS rare_ratio,
      round(df_sum * 1.0 / n_distinct, 6) AS mean_df_r
    FROM per_doc"""


# ------------------------------------------------------ text normalization


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Curation-grade text normalization (map-only, codegen'd):

    - strip ASCII control characters,
    - collapse runs of whitespace to one space, trim,
    - lowercase,
    - drop non-printable leftovers beyond basic latin + common punctuation
      (portable regex subset; full NFKC needs ICU, out of scope for the
      SQL-twin contract).

    Output keeps the original doc_id plus the normalized text, its md5 and
    length — the columns an exact-dedup or shingling stage consumes next.
    """
    t = F.col(text_col)
    norm = F.lower(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(t, "[\\x00-\\x1f\\x7f]", " "),
                r"\s+",
                " ",
            )
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.md5(norm).alias("norm_md5"),
        F.length(norm).alias("norm_len"),
    )


def normalize_text_sql(table: str = "documents") -> str:
    norm = (
        "lower(trim(regexp_replace(regexp_replace(text,"
        " '[\\x00-\\x1f\\x7f]', ' ', 'g'), '\\s+', ' ', 'g')))"
    )
    return f"""
    SELECT doc_id, {norm} AS norm_text, md5({norm}) AS norm_md5,
           length({norm}) AS norm_len
    FROM {table}"""


# ----------------------------------------------- corpus char-trigram LM


def _char_trigrams(sql: str) -> Column:
    """All char trigrams of a string expression (a short string yields
    itself) — built as one SQL transform so it stays in codegen."""
    return F.expr(
        f"transform(sequence(1, greatest(length({sql}) - 2, 1)), "
        f"i -> substring({sql}, i, 3))"
    )


def trigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    sample_mod: int = 5,
    min_count: int = 3,
) -> DataFrame:
    """Language-model fluency proxy: score each document by how familiar
    its character trigrams are to a model trained on a corpus SAMPLE — the
    KenLM-perplexity-filter shape of CCNet/RefinedWeb curation, built from
    the corpus itself (no external model ships in this sandbox; the plumb
    — sampled train split, bounded model, broadcastable lookup, exact
    per-doc reduction — is the real thing).

    Model = trigram counts over docs with ``doc_id % sample_mod == 0``,
    pruned to counts ≥ ``min_count`` (bounds the table to frequent
    trigrams — charset³ worst case, far smaller in practice; the unseen
    fallback is count 0, the +0 smoothing of a hit-rate score). Score =
    sum(model count per trigram) / n_trigrams — all-integer until ONE
    exact division (engine-portable, no float accumulation).

    Scale shape: trigram explode is ~3 bytes/char amplification (same
    class as the shingle stage of MinHash dedup), one tri-keyed shuffle
    for the model, one for the join-back reduction — both with map-side
    combine.
    """
    # lower() ONCE per row, then explode trigrams over the materialized
    # column — inlining lower() into the transform lambda makes codegen
    # re-lowercase the whole string per array element (O(len²) per doc)
    tris = docs.withColumn("_lt", F.lower(F.col(text_col))).select(
        "doc_id",
        F.col("doc_id").alias("_did"),
        F.explode(_char_trigrams("_lt")).alias("tri"),
    )
    model = (
        tris.filter(F.col("_did") % sample_mod == 0)
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    per_doc = (
        # the pruned model is bounded (frequent trigrams only) — broadcast
        # it so the CORPUS-scale trigram stream never shuffles on tri; the
        # only full-corpus shuffle left is the doc_id reduction (map-side
        # combined). Without this the join repartitions every trigram of
        # every document — the dominant cost at 100 TB.
        tris.join(F.broadcast(model), "tri", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tris"),
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).alias("hit_mass"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tris",
        "hit_mass",
        F.round(F.col("hit_mass") / F.col("n_tris"), 6).alias("lm_score"),
    )


def trigram_lm_score_sql(
    table: str = "documents", sample_mod: int = 5, min_count: int = 3
) -> str:
    tri = "substring(lower(text), i, 3)"
    return f"""
    WITH tris AS (
      SELECT doc_id, {tri} AS tri
      FROM {table},
           LATERAL (SELECT unnest(range(1,
             greatest(length(lower(text)) - 2, 1) + 1)) AS i)
    ), model AS (
      SELECT tri, count(*) AS cnt FROM tris
      WHERE doc_id % {sample_mod} = 0
      GROUP BY 1 HAVING count(*) >= {min_count}
    ), per_doc AS (
      SELECT t.doc_id,
        count(*) AS n_tris,
        sum(coalesce(m.cnt, 0)) AS hit_mass
      FROM tris t LEFT JOIN model m USING (tri)
      GROUP BY 1
    )
    SELECT doc_id, n_tris, CAST(hit_mass AS BIGINT) AS hit_mass,
      round(hit_mass * 1.0 / n_tris, 6) AS lm_score
    FROM per_doc"""


# ------------------------------------------------- Gopher quality rules


# The canonical Gopher repetition-free quality gates (Rae et al. 2021,
# Table A1 — the rule battery fineweb/Dolma re-implement), restricted to
# the signals computable from plain text. Distinct from quality_features'
# soft composite score: this is the HARD pass/fail filter stage, and every
# threshold is evaluated in cross-multiplied INTEGER space (no ratio
# doubles), so the verdicts are bit-identical across engines.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule flags + the AND-of-all `passes` verdict.

    Rules (integer cross-multiplication form):
      r_word_count     50 <= n_words <= 100000
      r_mean_word_len  3*n_words <= sum(len(word)) <= 10*n_words
      r_symbol_ratio   10*(n_hash + n_ellipsis) <= n_words
      r_alpha_words    5*n_alpha_words >= 4*n_words  (>= 80%)
      r_stopwords      >= 2 DISTINCT Gopher stopwords present

    Map-only: every signal folds over the token array with built-ins —
    one pass over the corpus, no shuffle at all. The token array is
    aliased in its own projection and referenced 6 times downstream, so
    CollapseProject keeps it materialized once per row instead of
    re-splitting the text per rule (the word_shingles O(len²) lesson:
    Catalyst inlines non-aliased subexpressions into every use site)."""
    t = F.col(text_col)
    toked = docs.select(
        "doc_id",
        tokens(t).alias("_toks"),
        F.regexp_count(t, F.lit("#")).alias("_n_hash"),
        F.regexp_count(t, F.lit(r"\.\.\.")).alias("_n_ellipsis"),
    )
    toks = F.col("_toks")
    counts = toked.select(
        "doc_id",
        "_n_hash",
        "_n_ellipsis",
        F.size(toks).alias("_n_words"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("_sum_len"),
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).alias(
            "_n_alpha"
        ),
        F.size(
            F.array_distinct(
                F.transform(
                    F.filter(
                        toks, lambda x: F.lower(x).isin(*GOPHER_STOPWORDS)
                    ),
                    lambda x: F.lower(x),
                )
            )
        ).alias("_n_stop"),
    )
    n_words = F.col("_n_words")
    r_word_count = (n_words >= 50) & (n_words <= 100000)
    r_mean_word_len = (F.lit(3) * n_words <= F.col("_sum_len")) & (
        F.col("_sum_len") <= F.lit(10) * n_words
    )
    r_symbol_ratio = (
        F.lit(10) * (F.col("_n_hash") + F.col("_n_ellipsis")) <= n_words
    )
    r_alpha_words = F.lit(5) * F.col("_n_alpha") >= F.lit(4) * n_words
    r_stopwords = F.col("_n_stop") >= 2
    return counts.select(
        "doc_id",
        n_words.alias("n_words"),
        r_word_count.alias("r_word_count"),
        r_mean_word_len.alias("r_mean_word_len"),
        r_symbol_ratio.alias("r_symbol_ratio"),
        r_alpha_words.alias("r_alpha_words"),
        r_stopwords.alias("r_stopwords"),
        (
            r_word_count
            & r_mean_word_len
            & r_symbol_ratio
            & r_alpha_words
            & r_stopwords
        ).alias("passes"),
    )


def gopher_rules_sql(table: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    toks = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"
    return f"""
    WITH base AS (
      SELECT doc_id,
        len({toks}) AS n_words,
        CAST(coalesce(list_sum(list_transform({toks}, t -> length(t))), 0)
             AS BIGINT) AS sum_len,
        len(regexp_extract_all(text, '#')) AS n_hash,
        len(regexp_extract_all(text, '\\.\\.\\.')) AS n_ellipsis,
        len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))
          AS n_alpha,
        len(list_distinct(list_transform(
          list_filter({toks}, t -> lower(t) IN ({stop_list})),
          t -> lower(t)))) AS n_stop
      FROM {table}
    )
    SELECT doc_id, n_words,
      (n_words >= 50 AND n_words <= 100000) AS r_word_count,
      (3*n_words <= sum_len AND sum_len <= 10*n_words) AS r_mean_word_len,
      (10*(n_hash + n_ellipsis) <= n_words) AS r_symbol_ratio,
      (5*n_alpha >= 4*n_words) AS r_alpha_words,
      (n_stop >= 2) AS r_stopwords,
      ((n_words >= 50 AND n_words <= 100000)
       AND (3*n_words <= sum_len AND sum_len <= 10*n_words)
       AND (10*(n_hash + n_ellipsis) <= n_words)
       AND (5*n_alpha >= 4*n_words)
       AND (n_stop >= 2)) AS passes
    FROM base"""


# ------------------------------------------------ corpus top n-gram report


def top_ngrams(
    docs: DataFrame, k: int = 50, n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Corpus-level heavy-hitter n-grams by DOCUMENT frequency — the
    boilerplate detector behind C4-style "most common lines/phrases"
    stripping: an n-gram present in a large share of documents is
    template text, not content, and its report drives removal rules.

    df = number of distinct docs containing the n-gram (word_shingles is
    per-doc distinct, so one explode+count IS document frequency);
    share_ppm = df·10⁶ // n_docs in integer space. Top-``k`` under the
    total order (df DESC, gram ASC) — deterministic at ties.

    Scale shape: the explode is the shingle stage every dedup op already
    pays; ONE gram-keyed count shuffle with map-side combine, then a
    global top-k which Spark executes as TakeOrdered (per-partition heaps
    + driver merge of k·P rows — no global sort of the gram table).
    """
    from tiflow_spark.llm.dedup import word_shingles

    grams = docs.select(
        "doc_id", F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("_nd"))
    counted = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    return (
        counted.crossJoin(F.broadcast(n_docs))
        .select(
            "gram",
            "df",
            F.expr("df * 1000000 div _nd").alias("share_ppm"),
        )
        .orderBy(F.col("df").desc(), F.col("gram").asc())
        .limit(k)
    )


def top_ngrams_sql(
    table: str = "documents", k: int = 50, n: int = 3
) -> str:
    from tiflow_spark.llm.dedup import _shingles_sql

    return f"""
    WITH grams AS (
      SELECT doc_id, unnest({_shingles_sql('text', n)}) AS gram
      FROM {table}
    ),
    counted AS (SELECT gram, count(*) AS df FROM grams GROUP BY 1),
    nd AS (SELECT count(*) AS n_docs FROM {table})
    SELECT gram, df, CAST(df AS BIGINT) * 1000000 // n_docs AS share_ppm
    FROM counted CROSS JOIN nd
    ORDER BY df DESC, gram ASC LIMIT {k}"""


def remove_duplicate_lines(
    docs: DataFrame,
    min_df: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Line-level boilerplate REMOVAL (the C4/RefinedWeb rewrite stage
    the top_ngrams report feeds): a line whose trimmed form appears in
    ``min_df`` or more DISTINCT documents is template text (nav bars,
    cookie banners, license footers) and is dropped from every document;
    remaining lines keep their original order. Blank lines (trimmed to
    '') are exempt from the hot set — they are paragraph separators, not
    template text, and stripping them corpus-wide would silently collapse
    paragraph structure the moment min_df docs contain any blank line.
    Returns (doc_id,
    text, n_lines, n_removed) — docs whose every line is boilerplate
    survive with empty text so the caller's quality gate decides their
    fate.

    Scale shape: one posexplode over lines (map-only), ONE line-keyed
    count shuffle with map-side combine (distinct (doc, line) first —
    word_shingles-style per-doc dedup makes the count a true document
    frequency), a line-keyed anti-join of the lines against the hot set
    (boilerplate is by definition a small distinct set — AQE broadcasts
    it when it fits), and one doc_id fold that reassembles via
    sort_array(collect_list(struct(pos, line))) — no windows, no global
    sort. Reference scope: beyond-parity LLM-pipeline operator (the
    reference replicates rows; corpus curation is this repo's §LLM
    surface).
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.trim(F.col("line")))
    hot = (
        lines.select("doc_id", "norm")
        .filter(F.col("norm") != "")
        .distinct()
        .groupBy("norm")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("norm")
    )
    kept = lines.join(hot, "norm", "left_anti")
    stats = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return (
        stats.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .alias("n_removed"),
        )
    )


def remove_duplicate_lines_sql(
    corpus_cte: str = "corpus AS (SELECT doc_id, text FROM documents)",
    min_df: int = 3,
) -> str:
    """DuckDB mirror of :func:`remove_duplicate_lines` over a CTE named
    `corpus` providing (doc_id, text). List-based (order falls out of
    list_filter, so no ordinality machinery): the hot set rides in as a
    one-row list cross join."""
    keep = "list_filter(ls, l -> NOT list_contains(hs, trim(l)))"
    return f"""WITH {corpus_cte},
    docs_l AS (
      SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus
    ),
    norms AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(ls, l -> trim(l)))) AS norm
      FROM docs_l
    ),
    hot AS (
      SELECT norm FROM (
        SELECT norm, count(*) AS df FROM norms WHERE norm <> '' GROUP BY 1
      ) WHERE df >= {min_df}
    ),
    h1 AS (SELECT coalesce(list(norm), []) AS hs FROM hot)
    SELECT doc_id,
           array_to_string({keep}, chr(10)) AS text,
           CAST(len(ls) AS BIGINT) AS n_lines,
           CAST(len(ls) - len({keep}) AS BIGINT) AS n_removed
    FROM docs_l CROSS JOIN h1"""
