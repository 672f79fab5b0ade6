"""PII detection + redaction for training-data pipelines.

Scrubbing personally-identifiable strings (emails, phone numbers, IP
addresses) is a standard pre-training hygiene pass. Everything here is
built-in `regexp_replace` / `regexp_count` — a map-only, whole-stage
codegen'd stage at 100 TB, no Python in the path.

Patterns are deliberately written in the common subset of Java regex
(Spark) and RE2 (DuckDB): character classes, bounded repetition and ASCII
word boundaries only — no lookaround, no backreferences — so the oracle
runs the *same* pattern text on both engines.

The synthetic documents table contains no PII, so `pii_corpus` injects
deterministic markers (emails / phones / IPs keyed off doc_id) the same
way dedup.corpus_with_dups injects duplicates; detection then has real
positives and real negatives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Common Java-regex / RE2 subset (see module docstring).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_corpus(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic PII injection over the documents table.

    doc_id % 4 == 0 → an email; == 1 → a phone; == 2 → an IP; == 3 → clean.
    Every 8th doc gets a second email, so per-doc counts exceed 1.
    """
    t = F.col(text_col)
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact agent"), did.cast("string"), F.lit("@mail.example.com")
    )
    phone = F.concat(
        F.lit(" call 555-"),
        F.lpad((did % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit(" from 10."),
        (did % 256).cast("string"),
        F.lit("."),
        ((did * 7) % 256).cast("string"),
        F.lit("."),
        ((did * 13) % 256).cast("string"),
    )
    extra = F.when(
        did % 8 == 0,
        F.concat(F.lit(" cc ops"), did.cast("string"), F.lit("@example.org")),
    ).otherwise(F.lit(""))
    injected = (
        F.when(did % 4 == 0, F.concat(t, email))
        .when(did % 4 == 1, F.concat(t, phone))
        .when(did % 4 == 2, F.concat(t, ip))
        .otherwise(t)
    )
    return docs.select("doc_id", F.concat(injected, extra).alias("text"))


PII_CORPUS_SQL = """
corpus AS (
  SELECT doc_id,
    (CASE doc_id % 4
       WHEN 0 THEN text || ' contact agent' || doc_id || '@mail.example.com'
       WHEN 1 THEN text || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                 || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       WHEN 2 THEN text || ' from 10.' || (doc_id % 256) || '.'
                 || ((doc_id * 7) % 256) || '.' || ((doc_id * 13) % 256)
       ELSE text END)
    || (CASE WHEN doc_id % 8 = 0
             THEN ' cc ops' || doc_id || '@example.org' ELSE '' END) AS text
  FROM documents
)"""


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII counts + the redacted text.

    Redaction order matters only across overlapping pattern classes; these
    three are disjoint by construction (dashes vs dots vs '@'), but we fix
    the order email → ip → phone anyway so the oracle is order-identical.
    """
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    n_email = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phone = F.regexp_count(t, F.lit(PHONE_RE))
    n_ip = F.regexp_count(t, F.lit(IPV4_RE))
    return docs.select(
        "doc_id",
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        n_ip.alias("n_ip"),
        (n_email + n_phone + n_ip > 0).alias("has_pii"),
        F.md5(scrubbed).alias("scrub_md5"),
    )


def pii_scrub_sql() -> str:
    def esc(p: str) -> str:
        return p.replace("'", "''")

    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{esc(EMAIL_RE)}', '<EMAIL>', 'g'), "
        f"'{esc(IPV4_RE)}', '<IP>', 'g'), "
        f"'{esc(PHONE_RE)}', '<PHONE>', 'g')"
    )
    return f"""WITH {PII_CORPUS_SQL.strip()}
SELECT doc_id,
  len(regexp_extract_all(text, '{esc(EMAIL_RE)}')) AS n_email,
  len(regexp_extract_all(text, '{esc(PHONE_RE)}')) AS n_phone,
  len(regexp_extract_all(text, '{esc(IPV4_RE)}')) AS n_ip,
  (len(regexp_extract_all(text, '{esc(EMAIL_RE)}'))
   + len(regexp_extract_all(text, '{esc(PHONE_RE)}'))
   + len(regexp_extract_all(text, '{esc(IPV4_RE)}'))) > 0 AS has_pii,
  md5({scrub}) AS scrub_md5
FROM corpus"""
