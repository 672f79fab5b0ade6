"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-shaped for 100 TB:
- exact:         hash-groupBy on md5(text) — one shuffle keyed by digest
- n-gram Jaccard: shingle-explode + self-join on shingle (candidate pairs
                  only materialize for docs sharing a shingle), then
                  common/total ratio — the join key is the shingle, so the
                  shuffle is bounded by posting-list sizes, not n²
- MinHash + LSH:  k min-hashes per doc (map-side), banded signatures,
                  bucket-join on band signature → candidates, verified with
                  true Jaccard. The classic sub-quadratic path.
- SimHash:        64-bit sign-aggregated token hashes; near-dups = small
                  Hamming distance within LSH buckets on 16-bit chunks.
- embedding:      cosine similarity over candidate blocks (label-blocked
                  here; IVF/LSH blocks at scale — see similarity.py).

Hashes are the engine-portable md5-based ones (functions/hashing.py), so
every operator is DuckDB-oracle-checkable. At scale swap portable_hash64 for
xxhash64 (same plan shape, faster) — flagged inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tiflow_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql_duckdb,
)

# ---------------------------------------------------------------- test corpus


def corpus_with_dups(docs: DataFrame) -> DataFrame:
    """Deterministic augmented corpus: exact clones (doc_id+10000, every 7th
    doc) and near-clones with the first two words dropped (doc_id+20000,
    every 5th doc). Gives the dedup operators real positives to find."""
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 3, 100000), " "
        ).alias("text"),
    )
    return docs.select("doc_id", "text").unionByName(exact).unionByName(near)


CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 20000,
         array_to_string(list_slice(string_split(text, ' '), 3, 100001), ' ')
  FROM documents WHERE doc_id % 5 = 0
)"""


# ---------------------------------------------------------------- exact dedup


def exact_dedup(corpus: DataFrame) -> DataFrame:
    """Exact dedup via content digest: canonical = min doc_id per digest.

    Returns (doc_id, canonical_id, group_size, is_dup). One hash-shuffle;
    map-side partial agg collapses per-partition duplicates first.
    """
    digest = F.md5(F.col("text")).alias("digest")
    groups = (
        corpus.select("doc_id", digest)
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )
    return (
        corpus.select("doc_id", digest)
        .join(groups, "digest")
        .select(
            "doc_id",
            "canonical_id",
            "group_size",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
        )
    )


EXACT_DEDUP_SQL = f"""WITH {CORPUS_SQL.strip()},
g AS (
  SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
         count(*) AS group_size
  FROM corpus GROUP BY 1
)
SELECT c.doc_id, g.canonical_id, g.group_size,
       c.doc_id <> g.canonical_id AS is_dup
FROM corpus c JOIN g ON md5(c.text) = g.digest"""


# ------------------------------------------------------------ shingling utils


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the text.

    Built from shifted-array zip_with instead of per-index element_at: an
    indexed lambda re-evaluates the (un-materialized) token array for every
    element — O(words²) splits per doc, measured 18× slower at sf0.1. The
    zip form references the token array O(n) times total."""
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    joined = toks
    for j in range(1, n):
        # zip_with pads the shorter side with null; concat_ws skips nulls,
        # so the tail entries are partial shingles — trimmed by the slice
        joined = F.zip_with(
            joined,
            F.slice(toks, j + 1, 2_000_000_000),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    full = F.slice(
        joined, 1, F.greatest(F.size(toks) - (n - 1), F.lit(1))
    )
    return F.array_distinct(full)


def _shingles_sql(text: str = "text", n: int = 3) -> str:
    toks = f"list_filter(string_split_regex({text}, '\\s+'), t -> t <> '')"
    parts = " || ' ' || ".join(f"toks[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len(toks) - {n - 1}, 1) + 1), i -> {parts}))"
    ).replace("toks", toks)


# ----------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs(
    corpus: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs (a < b) with word-n-gram Jaccard ≥ threshold.

    Inverted-index join: explode shingles, self-join on shingle, count
    common shingles per pair. No n² blowup — only docs sharing a shingle
    ever meet.

    ``max_df`` is the 100 TB skew knob: a shingle in d docs produces d²
    join rows, so stop-shingles (document frequency > max_df) are dropped
    from the index AND the per-doc sizes — Jaccard is then computed over
    the capped shingle vocabulary on both sides of the ratio, keeping the
    estimate unbiased for pairs that don't share hot shingles. The posting
    list bound makes worst-case join cost max_df² per shingle.
    """
    # shingle ONCE, persist the per-doc arrays, and explode from the cache:
    # the exploded frame feeds up to four plan branches (the stop-shingle
    # df aggregate, the per-doc sizes, and both self-join sides) and
    # Catalyst shares no subtrees across branches — without the persist
    # the split+zip_with shingling re-ran once per branch (r14; the same
    # shingle-once idiom as minhash_lsh_pairs)
    sh_arr = corpus.select(
        "doc_id", word_shingles(F.col("text"), n).alias("sh")
    ).persist()
    sh = sh_arr.select("doc_id", F.explode("sh").alias("shingle"))
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("sh_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("sh_b"))
    jac = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("common")
                / (F.col("sh_a") + F.col("sh_b") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_sql(
    threshold: float = 0.5, n: int = 3, max_df: int | None = None
) -> str:
    cap_cte = (
        """sh AS (
  SELECT * FROM sh_all WHERE shingle IN
    (SELECT shingle FROM sh_all GROUP BY 1 HAVING count(*) <= %d)
),"""
        % max_df
        if max_df is not None
        else "sh AS (SELECT * FROM sh_all),"
    )
    return f"""WITH {CORPUS_SQL.strip()},
sh_all AS (
  SELECT doc_id, unnest({_shingles_sql("text", n)}) AS shingle FROM corpus
),
{cap_cte}
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) >= {threshold}"""


# --------------------------------------------------------------- MinHash LSH


def minhash_signatures(
    corpus: DataFrame, num_hashes: int = 16, n: int = 3
) -> DataFrame:
    """k min-hashes per doc: min over shingles of hash(i ⊕ shingle).

    Uses lexicographic min of md5(i:shingle) hex strings — portable and a
    valid minwise family. Map-only stage. (At scale: xxhash64(shingle, seed_i)
    — same shape, cheaper.)
    """
    sh = corpus.select(
        "doc_id", F.explode(word_shingles(F.col("text"), n)).alias("s")
    )
    return _signatures_from_shingles(sh, num_hashes)


_M61 = (1 << 61) - 1  # Mersenne prime modulus for the universal family


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int, int]]:
    """Deterministic 31-bit coefficients (a, c, b) for h_i = (a·hL + c·hH
    + b) mod 2⁶¹−1 — shared by the Spark and DuckDB sides so signatures
    match by construction."""
    out = []
    for i in range(num_hashes):
        a = (2654435761 * (2 * i + 1)) % 2147483647 or 1
        c = (40503 * (i + 1) * 2654435761) % 2147483647 or 1
        b = (97 + 1013904223 * (i + 1)) % 2147483647
        out.append((a, c, b))
    return out


def _signatures_from_shingles(
    exploded: DataFrame, num_hashes: int
) -> DataFrame:
    """(doc_id, shingle) rows → k min-hash columns.

    ONE portable 60-bit digest per shingle occurrence (md5-based), split
    into 30-bit halves, then k cheap integer mixes h_i = (a·hL + c·hH + b)
    mod 2⁶¹−1 — a universal family, so still a valid minwise scheme, at
    1/k the string-hash cost of digesting per hash function (measured ~2×
    end-to-end at sf0.1). All operands stay < 2⁶² — identical overflow-free
    BIGINT arithmetic on both engines. The k mins combine map-side, so the
    doc_id shuffle carries only k longs per doc."""
    h = portable_hash64(F.col("s"))
    halves = exploded.select(
        "doc_id",
        F.pmod(h, F.lit(1 << 30)).alias("hL"),
        F.shiftright(h, 30).alias("hH"),
    )
    # each mix is ONE parsed SQL expression: building the k aggregates
    # Column-by-Column cost ~0.35 s of py4j round-trips per invocation
    # (r14, same pathology as the PQ codebook) — this constructor runs
    # once per headline dedup query AND once per ingest micro-batch. The
    # parsed tree (int-literal coefficients promote to BIGINT in the
    # products, pmod against the BIGINT Mersenne literal) is the same
    # Catalyst plan, values bit-identical.
    return halves.groupBy("doc_id").agg(
        *[
            F.expr(
                f"min(pmod({a} * hL + {c} * hH + {b}, {_M61}))"
            ).alias(f"mh_{i}")
            for i, (a, c, b) in enumerate(_minhash_coeffs(num_hashes))
        ]
    )


def minhash_lsh_pairs(
    corpus: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate generation + true-Jaccard verification.

    bands × rows/band signatures; docs sharing any band bucket become
    candidates (shuffle keyed on (band, signature) — sub-quadratic), then
    exact Jaccard over shingle sets filters false positives.

    ``max_bucket`` is the 100 TB hot-bucket knob: a band bucket of d docs
    expands to d² candidate pairs, and real corpora have mega-buckets
    (boilerplate, templated pages) where d reaches millions. Buckets
    larger than ``max_bucket`` are STAR-LINKED instead — every member
    pairs only with the bucket's minimum doc_id — turning d² into d while
    preserving connectivity for :func:`duplicate_groups` (connected
    components over verified pairs). Caveat: a star edge the verifier
    rejects can split a group that all-pairs expansion would have kept
    joined transitively; acceptable because over-cap buckets are
    near-identical boilerplate in practice (their members agree on a full
    band), and exact dedup upstream should have removed identical docs
    already. Default None = exact all-pairs (the oracle-mirrored mode).
    """
    rows_per_band = num_hashes // bands
    # shingle ONCE, persist, and feed both the signature and verification
    # stages — shingling is the dominant map cost at scale
    sh_arr = corpus.select(
        "doc_id", word_shingles(F.col("text"), n).alias("sh")
    ).persist()
    sigs = _signatures_from_shingles(
        sh_arr.select("doc_id", F.explode("sh").alias("s")), num_hashes
    )
    band_cols = [
        F.concat_ws(
            "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_cols[b].alias("sig"))
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    if max_bucket is not None:
        stats = banded.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("_bsz"), F.min("doc_id").alias("_rep")
        )
        banded = banded.join(stats, ["band", "sig"])
        small = banded.filter(F.col("_bsz") <= max_bucket).drop("_bsz", "_rep")
        star = (
            banded.filter(
                (F.col("_bsz") > max_bucket) & (F.col("doc_id") != F.col("_rep"))
            )
            .select(F.col("_rep").alias("id_a"), F.col("doc_id").alias("id_b"))
        )
    else:
        small, star = banded, None
    a, b = small.alias("a"), small.alias("b")
    cands = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    if star is not None:
        cands = cands.unionByName(star)
    cands = cands.distinct()
    # verify candidates with true jaccard over the SAME persisted shingles
    sa = sh_arr.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh_arr.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


def minhash_lsh_sql(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int | None = None,
) -> str:
    rows_per_band = num_hashes // bands
    mh = ", ".join(
        f"list_min(list_transform(hv, h -> "
        f"({a} * (h % 1073741824) + {c} * (h // 1073741824) + {b})"
        f" % 2305843009213693951)) AS mh_{i}"
        for i, (a, c, b) in enumerate(_minhash_coeffs(num_hashes))
    )
    band_rows = ", ".join(
        "({b}, {sig})".format(
            b=b,
            sig="concat_ws('|', "
            + ", ".join(f"mh_{b * rows_per_band + r}" for r in range(rows_per_band))
            + ")",
        )
        for b in range(bands)
    )
    if max_bucket is None:
        cands = """cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""
    else:
        cands = f"""stats AS (
  SELECT band, sig, count(*) AS bsz, min(doc_id) AS rep
  FROM banded GROUP BY 1, 2
),
bb AS (
  SELECT b.doc_id, b.band, b.sig, s.bsz, s.rep
  FROM banded b JOIN stats s ON b.band = s.band AND b.sig = s.sig
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bb a JOIN bb b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
   AND a.bsz <= {max_bucket}
  UNION
  SELECT DISTINCT rep AS id_a, doc_id AS id_b
  FROM bb WHERE bsz > {max_bucket} AND doc_id <> rep
)"""
    return f"""WITH {CORPUS_SQL.strip()},
sh AS (SELECT doc_id, {_shingles_sql("text", n)} AS sh FROM corpus),
hs AS (SELECT doc_id,
       list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hv
       FROM sh),
sigs AS (SELECT doc_id, {mh} FROM hs),
banded AS (
  SELECT doc_id, b.* FROM sigs,
  LATERAL (VALUES {band_rows}) AS b(band, sig)
),
{cands}
SELECT id_a, id_b,
  round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
        len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cands
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
            len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= {threshold}"""


def lsh_index_compact_sql(
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    max_bucket: int = 2,
) -> str:
    """DuckDB oracle for the stats-sidecar re-cap: a FRESH capped index
    build over the full corpus — which is exactly what
    :func:`compact_lsh_index` with true counts must equal."""
    rows_per_band = num_hashes // bands
    mh = ", ".join(
        f"list_min(list_transform(hv, h -> "
        f"({a} * (h % 1073741824) + {c} * (h // 1073741824) + {b})"
        f" % 2305843009213693951)) AS mh_{i}"
        for i, (a, c, b) in enumerate(_minhash_coeffs(num_hashes))
    )
    band_rows = ", ".join(
        "({b}, {sig})".format(
            b=b,
            sig="concat_ws('|', "
            + ", ".join(
                f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
            )
            + ")",
        )
        for b in range(bands)
    )
    return f"""WITH {CORPUS_SQL.strip()},
sh AS (SELECT doc_id, {_shingles_sql("text", n)} AS sh FROM corpus),
hs AS (SELECT doc_id,
       list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hv
       FROM sh),
sigs AS (SELECT doc_id, {mh} FROM hs),
banded AS (
  SELECT doc_id, b.* FROM sigs,
  LATERAL (VALUES {band_rows}) AS b(band, sig)
),
stats AS (
  SELECT band, sig, count(*) AS total_seen, min(doc_id) AS rep
  FROM banded GROUP BY 1, 2
)
SELECT b.doc_id, b.band, b.sig
FROM banded b JOIN stats s ON b.band = s.band AND b.sig = s.sig
WHERE s.total_seen <= {max_bucket} OR b.doc_id = s.rep"""


def dedup_incremental_sql(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int | None = None,
    new_min: int = 10000,
) -> str:
    """DuckDB mirror of :func:`dedup_incremental` over the corpus_with_dups
    fixture split at ``new_min``: base docs (< new_min) form the persisted
    index (capped at build time when ``max_bucket`` is set, over-cap
    buckets keep only the min-doc representative row), new docs join it
    plus themselves (in-batch over-cap buckets star-link through the rep).
    Verification is the same exact-Jaccard expression as the full run."""
    rows_per_band = num_hashes // bands
    mh = ", ".join(
        f"list_min(list_transform(hv, h -> "
        f"({a} * (h % 1073741824) + {c} * (h // 1073741824) + {b})"
        f" % 2305843009213693951)) AS mh_{i}"
        for i, (a, c, b) in enumerate(_minhash_coeffs(num_hashes))
    )
    band_rows = ", ".join(
        "({b}, {sig})".format(
            b=b,
            sig="concat_ws('|', "
            + ", ".join(f"mh_{b * rows_per_band + r}" for r in range(rows_per_band))
            + ")",
        )
        for b in range(bands)
    )
    if max_bucket is None:
        idx = f"idx AS (SELECT * FROM banded WHERE doc_id < {new_min})"
        nvn = """nvn AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM new_banded a JOIN new_banded b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""
    else:
        idx = f"""idx_stats AS (
  SELECT band, sig, count(*) AS bsz, min(doc_id) AS rep
  FROM banded WHERE doc_id < {new_min} GROUP BY 1, 2
),
idx AS (
  SELECT b.doc_id, b.band, b.sig
  FROM banded b JOIN idx_stats s ON b.band = s.band AND b.sig = s.sig
  WHERE b.doc_id < {new_min}
    AND (s.bsz <= {max_bucket} OR b.doc_id = s.rep)
)"""
        nvn = f"""new_stats AS (
  SELECT band, sig, count(*) AS bsz, min(doc_id) AS rep
  FROM new_banded GROUP BY 1, 2
),
nb AS (
  SELECT b.doc_id, b.band, b.sig, s.bsz, s.rep
  FROM new_banded b JOIN new_stats s ON b.band = s.band AND b.sig = s.sig
),
nvn AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM nb a JOIN nb b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
   AND a.bsz <= {max_bucket}
  UNION
  SELECT DISTINCT rep AS id_a, doc_id AS id_b
  FROM nb WHERE bsz > {max_bucket} AND doc_id <> rep
)"""
    return f"""WITH {CORPUS_SQL.strip()},
sh AS (SELECT doc_id, {_shingles_sql("text", n)} AS sh FROM corpus),
hs AS (SELECT doc_id,
       list_transform(sh, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hv
       FROM sh),
sigs AS (SELECT doc_id, {mh} FROM hs),
banded AS (
  SELECT doc_id, b.* FROM sigs,
  LATERAL (VALUES {band_rows}) AS b(band, sig)
),
new_banded AS (SELECT * FROM banded WHERE doc_id >= {new_min}),
{idx},
nvo AS (
  SELECT DISTINCT least(n.doc_id, i.doc_id) AS id_a,
                  greatest(n.doc_id, i.doc_id) AS id_b
  FROM new_banded n JOIN idx i ON n.band = i.band AND n.sig = i.sig
  WHERE n.doc_id <> i.doc_id
),
{nvn},
cands AS (SELECT * FROM nvo UNION SELECT * FROM nvn)
SELECT id_a, id_b,
  round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
        len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
FROM cands
JOIN sh sa ON sa.doc_id = id_a
JOIN sh sb ON sb.doc_id = id_b
WHERE round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
            len(list_distinct(list_concat(sa.sh, sb.sh))), 6) >= {threshold}"""


# ------------------------------------------------------------------- SimHash


def simhash(corpus: DataFrame, bits: int = 60) -> DataFrame:
    """SimHash over word tokens: per bit b, sum ±1 votes across token
    hashes; sign vector → fingerprint. 60 bits (the portable-hash range).
    Pure array expressions, map-only."""
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    )
    hashes = F.transform(toks, portable_hash64)
    # ONE aggregate pass building all `bits` vote counters at once (the old
    # form ran `bits` independent aggregates, each re-evaluating the token
    # hashes — a 60x constant factor). Bit b of h tests as h & 2^b against a
    # literal powers array (shiftright needs a static shift amount).
    powers = F.array(*[F.lit(1 << b).cast("bigint") for b in range(bits)])
    zero = F.array_repeat(F.lit(0), bits)
    votes = F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda a, p: a
            + F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    fp = F.aggregate(
        F.zip_with(
            votes,
            powers,
            lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return corpus.select("doc_id", fp.alias("simhash"))


def simhash_sql(bits: int = 60) -> str:
    toks = (
        "list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),"
        " t -> t <> ''))"
    )
    h = portable_hash64_sql_duckdb("t")
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(bits)
    )
    return f"""WITH {CORPUS_SQL.strip()},
hs AS (SELECT doc_id, list_transform({toks}, t -> {h}) AS hs FROM corpus)
SELECT doc_id, {bit_terms} AS simhash FROM hs"""


def simhash_pairs(fps: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance ≤ max_hamming, blocked by 15-bit
    chunks (a pair within distance d must share ≥1 of 4 chunks when d ≤ 3)."""
    chunks = [
        F.shiftright(F.col("simhash"), 15 * i).bitwiseAND(F.lit((1 << 15) - 1))
        for i in range(4)
    ]
    blocked = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("chunk"), chunks[i].alias("val"))
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.val")
    a, b = blocked.alias("a"), blocked.alias("b")
    cands = (
        a.join(b, ["chunk", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select("id_a", "id_b", dist.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def simhash_pairs_oracle_sql(max_hamming: int = 3, bits: int = 60) -> str:
    toks = (
        "list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),"
        " t -> t <> ''))"
    )
    h = portable_hash64_sql_duckdb("t")
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(bits)
    )
    chunk_rows = ", ".join(
        f"({i}, (sim >> {15 * i}) & 32767)" for i in range(4)
    )
    return f"""WITH {CORPUS_SQL.strip()},
hs AS (SELECT doc_id, list_transform({toks}, t -> {h}) AS hs FROM corpus),
fp AS (SELECT doc_id, {bit_terms} AS sim FROM hs),
blocked AS (
  SELECT doc_id, sim, c.* FROM fp,
  LATERAL (VALUES {chunk_rows}) AS c(chunk, val)
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  a.sim AS sh_a, b.sim AS sh_b
  FROM blocked a JOIN blocked b
    ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cands WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}"""


# ------------------------------------------------------- duplicate grouping


def duplicate_groups(
    pairs: DataFrame, corpus: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Connected components over the near-dup pair graph + a canonical doc
    per component — the step that turns pairwise findings into the actual
    keep/drop decision a dedup pipeline executes.

    Min-label propagation to fixpoint: every paired doc starts labeled with
    its own id; each round a node adopts the min label in its closed
    neighborhood. A round is one equi-join + one aggregate keyed on doc_id;
    rounds needed = component diameter (near-dup clusters are small and
    star-ish, so a handful). The driver participates ONLY in the 1-scalar
    convergence probe per round, never in data volume; lineage is truncated
    per round (localCheckpoint) so the iterative plan stays flat. At
    extreme component sizes swap the round body for large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce") — same join
    shape, provably O(log n) rounds.

    Returns every corpus doc: (doc_id, group_id, group_size,
    is_representative) with group_id = min doc_id of the component and
    singletons grouping to themselves.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .persist()
    )
    # No edge distinct(): min-aggregation over a multiset equals min over
    # its set, so duplicate pairs cannot change any label — the distinct
    # was one full edge shuffle of pure overhead (r14). Round 1 needs no
    # identity-label frame either: min over the closed neighborhood is
    # least(own id, min incoming neighbor id), one aggregate straight off
    # the symmetric edge list (every paired doc appears as src).
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_m"))
        .select(
            F.col("src").alias("doc_id"),
            F.least("src", "_m").alias("label"),
        )
        .localCheckpoint()
    )
    try:
        for _ in range(max_iter - 1):
            nbr = edges.join(
                labels, edges["src"] == labels["doc_id"]
            ).select(F.col("dst").alias("doc_id"), "label")
            # carry the OLD label through the same aggregation (every
            # doc_id has exactly one labels row whose label rides as
            # `_old`; nbr rows contribute null) so the convergence probe
            # is a filter over the just-materialized frame instead of a
            # second join+shuffle job per round (r14)
            # LAZY checkpoint + full-count probe = ONE job per round (r15):
            # the probe action materializes every partition of the
            # checkpoint RDD (a full count, no limit short-circuit, so
            # LocalRDDCheckpointData finds all partitions cached and
            # schedules no fill-in job) AND answers convergence — the old
            # eager-checkpoint-then-probe shape paid two jobs per round.
            new = (
                labels.withColumn("_old", F.col("label"))
                .unionByName(
                    nbr.withColumn("_old", F.lit(None).cast("long"))
                )
                .groupBy("doc_id")
                .agg(
                    F.min("label").alias("label"),
                    F.min("_old").alias("_old"),
                )
                .localCheckpoint(eager=False)
            )
            improved = new.filter(F.col("label") < F.col("_old")).count()
            labels = new.select("doc_id", "label")
            if improved == 0:
                break
    finally:
        edges.unpersist()
    comp = labels.withColumnRenamed("label", "group_id")
    # group sizes from the component frame (bounded: paired docs only,
    # already materialized by the loop's checkpoint) — replaces a window
    # partitioned by group_id over the FULL corpus, whose exchange
    # shuffled every (mostly singleton) doc just to count the few
    # multi-member groups (r14). Unpaired docs are singletons by
    # construction, so their size is the literal 1. r15: the size is a
    # count-window over comp itself (groups are bounded by the LSH
    # hot-bucket caps upstream) — one exchange of the paired docs instead
    # of the r14 agg+join's two exchanges and an extra SortMergeJoin
    # (comp is a post-checkpoint LogicalRDD with no size statistics, so
    # the planner could never broadcast the agg back onto it).
    from pyspark.sql import Window

    comp = comp.withColumn(
        "_gsz", F.count(F.lit(1)).over(Window.partitionBy("group_id"))
    )
    return (
        corpus.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("group_id", F.col("doc_id")).alias("group_id"),
            F.coalesce("_gsz", F.lit(1).cast("long")).alias("group_size"),
            (
                F.col("doc_id")
                == F.coalesce("group_id", F.col("doc_id"))
            ).alias("is_representative"),
        )
    )


def keep_best_per_group(
    groups: DataFrame, corpus: DataFrame, quality: Column | None = None
) -> DataFrame:
    """Quality-aware keep policy over dup components: instead of the
    min-id canonical doc, keep the HIGHEST-quality member of each
    duplicate group (ties → lowest doc_id) — the keep rule production
    dedup pipelines actually run (the near-dup stages of public corpus
    recipes keep the longest / best-scored duplicate, not an arbitrary
    one; reference parity: this is the keep/drop decision the dedup
    findings feed, composed with a quality signal).

    `groups` is duplicate_groups() output; quality is any integer
    expression over the corpus frame (default: text length). One
    rank-window partitioned by group_id — groups are bounded by the LSH
    hot-bucket caps upstream (max_bucket/max_cluster star-linking), so no
    group can serialize a task at 100 TB.

    Returns (doc_id, group_id, group_size, quality, keep).
    """
    from pyspark.sql import Window

    if quality is None:
        quality = F.length("text")
    scored = groups.join(
        corpus.select("doc_id", quality.cast("long").alias("quality")),
        "doc_id",
    )
    w = (
        Window.partitionBy("group_id")
        .orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    )
    return scored.select(
        "doc_id",
        "group_id",
        "group_size",
        "quality",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def keep_best_sql(quality_sql: str = "length(text)") -> str:
    """DuckDB twin of duplicate_groups + keep_best_per_group over the
    minhash-LSH pair graph (recursive-CTE transitive closure)."""
    pairs = minhash_lsh_sql(16, 4, 0.5)
    return f"""WITH RECURSIVE {CORPUS_SQL.strip()},
    pairs AS (SELECT id_a, id_b FROM ({pairs})),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach (id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, min(label) AS group_id FROM reach GROUP BY id),
    grouped AS (
      SELECT c.doc_id, coalesce(comp.group_id, c.doc_id) AS group_id,
             CAST({quality_sql} AS BIGINT) AS quality
      FROM corpus c LEFT JOIN comp ON comp.id = c.doc_id
    )
    SELECT doc_id, group_id,
      CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size,
      quality,
      row_number() OVER (PARTITION BY group_id
                         ORDER BY quality DESC, doc_id ASC) = 1 AS keep
    FROM grouped"""


# ------------------------------------------------ incremental LSH dedup


def _band_rows(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, sig) rows from a minhash-signature frame."""
    rows_per_band = num_hashes // bands
    band_cols = [
        F.concat_ws(
            "|",
            *[
                F.col(f"mh_{b * rows_per_band + r}")
                for r in range(rows_per_band)
            ],
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_cols[b].alias("sig"))
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def minhash_index(
    corpus: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    max_bucket: int | None = None,
    with_stats: bool = False,
):
    """Persistable LSH index of a corpus: ``(shingles, banded)`` frames —
    (doc_id, sh array) for verification and (doc_id, band, sig) for
    candidate lookup. Write both as parquet partitioned however the lake
    likes; an ingest batch joins against them without touching the raw
    corpus text (the index IS the dedup state at 100 TB).

    ``max_bucket`` caps hot (band, sig) buckets AT BUILD TIME: a bucket
    with more members than the cap keeps only its representative (min
    doc_id) row, so a later :func:`dedup_incremental` join against the
    index pairs new docs with the representative instead of every member
    — the same star-link/recall trade-off as
    :func:`minhash_lsh_pairs`'s knob (over-cap buckets are near-identical
    boilerplate whose members were already pairwise-linked through the
    rep when THEY were ingested). Without it, one hot bucket in a 100 TB
    index makes every ingest batch's candidate set quadratic in that
    bucket. Buckets can re-grow past the cap as batch index rows are
    appended; re-apply the cap at index-compaction cadence (the same
    maintenance slot as bucketed-sink compaction).

    ``with_stats=True`` additionally returns a ``(band, sig, total_seen,
    rep)`` stats sidecar computed over the UNCAPPED banded rows — one row
    per bucket, tiny next to the index. Persist it alongside the index
    and fold batch stats in with :func:`merge_lsh_stats`: true bucket
    populations survive cap-dropped rows, which is what lets
    :func:`compact_lsh_index` re-cap a grown index EXACTLY as a fresh
    capped build would (the observed row count in a capped index
    undercounts once the cap has dropped members).
    """
    sh_arr = corpus.select(
        "doc_id", word_shingles(F.col("text"), n).alias("sh")
    )
    sigs = _signatures_from_shingles(
        sh_arr.select("doc_id", F.explode("sh").alias("s")), num_hashes
    )
    banded = _band_rows(sigs, num_hashes, bands)
    if with_stats or max_bucket is not None:
        # banded feeds MULTIPLE plan branches here (the bucket-stats
        # aggregate, the cap join's probe side, and callers' downstream
        # merges) and Catalyst shares no subtrees across branches, so the
        # whole shingle→minhash→band pipeline re-ran once per branch.
        # persist() (same idiom as minhash_lsh_pairs' shingle-once
        # persist) keeps Catalyst size statistics intact so the cap and
        # re-cap joins stay broadcast — a localCheckpoint here degrades
        # them to sort-merge (LogicalRDD has no stats), measured slower
        # than the re-evaluation it saves (r14).
        banded = banded.persist()
    stats = banded_bucket_stats(banded)
    if max_bucket is not None:
        banded = cap_banded(banded, stats, max_bucket)
    if with_stats:
        return sh_arr, banded, stats
    return sh_arr, banded


def banded_bucket_stats(banded: DataFrame) -> DataFrame:
    """True-count stats sidecar of a banded frame: one (band, sig,
    total_seen, rep) row per occupied bucket — the :func:`minhash_index`
    ``with_stats`` sidecar, exposed so a caller that already HOLDS banded
    rows (e.g. one shared minhash pass split into base/batch sides) can
    derive the sidecar without re-running the shingle→minhash pipeline."""
    return banded.groupBy("band", "sig").agg(
        F.count(F.lit(1)).alias("total_seen"), F.min("doc_id").alias("rep")
    )


def cap_banded(
    banded: DataFrame, stats: DataFrame, max_bucket: int
) -> DataFrame:
    """Apply the hot-bucket cap to banded rows given their stats sidecar:
    over-cap buckets keep only the representative (min doc_id) row — the
    :func:`minhash_index` ``max_bucket`` build-time cap, factored out for
    callers that compute banded rows once and cap a filtered side."""
    return (
        banded.join(stats, ["band", "sig"])
        .filter(
            (F.col("total_seen") <= max_bucket)
            | (F.col("doc_id") == F.col("rep"))
        )
        .drop("total_seen", "rep")
    )


def merge_lsh_stats(
    base_stats: DataFrame, batch_stats: DataFrame
) -> DataFrame:
    """Fold an ingest batch's bucket stats into the persisted index stats:
    per (band, sig), true populations add and the representative is the
    min doc_id ever seen. Banding is per-doc deterministic, so the merged
    sidecar equals the stats a from-scratch build over (old ∪ new) would
    compute — the invariant :func:`compact_lsh_index`'s exact re-cap
    relies on. One groupBy over two bucket-sized (not corpus-sized)
    frames."""
    return (
        base_stats.unionByName(batch_stats)
        .groupBy("band", "sig")
        .agg(
            F.sum("total_seen").alias("total_seen"),
            F.min("rep").alias("rep"),
        )
    )


def dedup_incremental(
    new_docs: DataFrame,
    index_shingles: DataFrame,
    index_banded: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int | None = None,
    return_index: bool = False,
):
    """INCREMENTAL near-dup detection — the production ingest shape: a new
    batch of documents is deduped against the EXISTING corpus via its LSH
    index plus against itself, without re-shingling or re-pairing the old
    corpus (whose own pairs were already emitted when it was ingested).

    Returns verified (id_a, id_b, jaccard) pairs where at least one side
    is a new document — exactly the pairs a full-corpus run over
    (old ∪ new) would emit minus the old-vs-old ones (banding is per-doc
    deterministic, so incremental == full restricted; the oracle asserts
    this equality).

    Scale shape: per ingest batch the cost is O(batch shingles) + a
    band-keyed join of batch-banded rows against the (pre-partitioned)
    index — the old corpus is touched only on the (band, sig) keys the
    batch actually hits; verification joins shingle arrays for candidate
    ids only. Append the returned batch index frames to keep the index
    current.

    ``max_bucket`` star-links hot (band, sig) buckets WITHIN the batch
    (same knob and trade-off as :func:`minhash_lsh_pairs`): over-cap
    in-batch buckets emit O(d) rep edges instead of O(d²) pairs. The
    index side must be capped at build time (:func:`minhash_index`
    ``max_bucket``) — re-scanning the whole index per batch to cap it
    here would defeat the touch-only-hit-keys shape. Fresh capped
    indexes and indexes re-capped via :func:`compact_lsh_index` with the
    true-count stats sidecar are interchangeable inputs here: the
    sidecar re-cap is exactly a fresh build (property-tested), and this
    function only equi-joins the index on (band, sig).

    The batch shingle/banded frames are ``persist()``-ed (they feed three
    branches). ``return_index=True`` returns ``(verified, new_sh,
    new_banded)`` so a long-lived ingest session can append them to the
    persisted index AND ``unpersist()`` both after materializing —
    otherwise per-batch cached partitions accumulate until executor
    storage eviction. One-shot callers that stop the session per batch
    can ignore this.
    """
    new_sh, new_banded = minhash_index(new_docs, num_hashes, bands, n)
    # the BATCH frames feed three branches (nvo join, nvn self-join,
    # verification) — persist them so shingling+minhash runs once per
    # batch, not once per branch. Batch-sized by definition; the INDEX
    # frames are deliberately NOT persisted (at production scale they are
    # parquet-backed and touched only on hit keys).
    new_sh = new_sh.persist()
    new_banded = new_banded.persist()
    # r15 (guide §3.1): the BATCH-side frames are bounded by the ingest
    # batch — broadcast them explicitly so the INDEX side is never
    # shuffled (the production contract: the old corpus is touched only
    # map-side, on the keys the batch hits). Without the hints the
    # planner sees agg-derived frames with no size statistics, plans
    # sort-merge joins, and AQE's runtime broadcast conversion still pays
    # the map-side shuffle write of every index row first (measured on
    # the ingest drain: ~29 AQE stages per batch body).
    # new-vs-index candidates (either orientation, canonical id order)
    old_side = index_banded.select(
        "band", "sig", F.col("doc_id").alias("_old_id")
    )
    nvo = (
        F.broadcast(new_banded).join(old_side, ["band", "sig"])
        .select(
            F.least(F.col("doc_id"), F.col("_old_id")).alias("id_a"),
            F.greatest(F.col("doc_id"), F.col("_old_id")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    # new-vs-new candidates (star-linked past the cap, like the
    # full-corpus path)
    if max_bucket is not None:
        nstats = new_banded.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("_bsz"), F.min("doc_id").alias("_rep")
        )
        nb = new_banded.join(nstats, ["band", "sig"])
        small = nb.filter(F.col("_bsz") <= max_bucket).drop("_bsz", "_rep")
        star = nb.filter(
            (F.col("_bsz") > max_bucket) & (F.col("doc_id") != F.col("_rep"))
        ).select(
            F.col("_rep").alias("id_a"), F.col("doc_id").alias("id_b")
        )
    else:
        small, star = new_banded, None
    a, b = small.alias("a"), small.alias("b")
    nvn = (
        a.join(F.broadcast(b), ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    if star is not None:
        nvn = nvn.unionByName(star)
    cands = nvo.unionByName(nvn).distinct()
    all_sh = index_shingles.unionByName(new_sh)
    sa = all_sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = all_sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    # candidates are batch-scale (every pair has ≥ 1 new side) — broadcast
    # them onto the big shingle side for both verification joins, so the
    # index shingles stream map-side instead of shuffling by id (§3.1)
    verified = (
        F.broadcast(cands).join(sa, "id_a")
    )
    verified = (
        F.broadcast(verified).join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )
    verified = verified.filter(F.col("jaccard") >= threshold)
    if return_index:
        return verified, new_sh, new_banded
    return verified


def compact_lsh_index(
    index_banded: DataFrame,
    max_bucket: int,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Re-apply the hot-bucket cap to an LSH index that grew by appended
    ingest batches — the index-maintenance step the incremental path
    schedules at compaction cadence (same slot as bucketed-sink
    compaction): buckets that crossed ``max_bucket`` since the last cap
    collapse back to their min-doc representative row.

    With ``stats`` (the true-count sidecar from
    ``minhash_index(with_stats=True)`` folded forward with
    :func:`merge_lsh_stats`), the re-cap is EXACTLY equivalent to
    rebuilding the index from scratch with the same cap over the same
    corpus (property-tested): a bucket whose TRUE population ≤ cap never
    had a row dropped, so all its rows are present and kept; a bucket
    whose true population > cap keeps only the true representative,
    which is always present because caps never drop the min-doc row and
    the merged rep is min(base rep, batch reps).

    Without ``stats``, only the OBSERVED row count is available, which
    undercounts once an earlier cap dropped members (hypothesis
    counterexample: base bucket {0,2,4} capped at 2 keeps {0}; appending
    doc 3 shows observed size 2 ≤ cap, so doc 3 survives re-cap where a
    fresh build over the true population 4 would drop it). The
    invariants that DO hold in that mode: every post-recap bucket has
    ≤ max(cap, 1) rows, the recapped set is idempotent under further
    recaps, and every bucket keeps its current representative — but NOT
    fresh-build equivalence. Pass the sidecar when exact interchange
    with fresh indexes matters."""
    if stats is None:
        stats = index_banded.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("total_seen"),
            F.min("doc_id").alias("rep"),
        )
    return (
        index_banded.join(
            stats.select("band", "sig", "total_seen", "rep"),
            ["band", "sig"],
        )
        .filter(
            (F.col("total_seen") <= max_bucket)
            | (F.col("doc_id") == F.col("rep"))
        )
        .drop("total_seen", "rep")
    )


# ------------------------------------------------- span-level dup coverage


def positional_kgrams(text: Column, k: int) -> Column:
    """Word k-grams in POSITION order (duplicates kept) — the rolling
    window of substring-level dedup. Same shifted-array zip_with build as
    word_shingles (the O(words) form), minus the distinct."""
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    joined = toks
    for j in range(1, k):
        joined = F.zip_with(
            joined,
            F.slice(toks, j + 1, 2_000_000_000),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.slice(joined, 1, F.greatest(F.size(toks) - (k - 1), F.lit(1)))


def span_coverage(corpus: DataFrame, k: int = 8) -> DataFrame:
    """Per-document duplicated-span coverage — the substring-dedup signal
    of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better"), re-expressed without suffix arrays: a k-gram is
    duplicated iff it occurs in >= 2 distinct documents, and a doc's
    coverage is the fraction of its token positions lying under at least
    one duplicated k-gram window.

    Returns (doc_id, n_tokens, dup_grams, covered_tokens, coverage).

    Scale shape — everything stays LINEAR in corpus size (unlike the
    pair-producing dedup family, no candidate pairs ever materialize):
    - one shuffle keyed by md5(k-gram) for the distinct-doc count
      (map-side partial agg; a boilerplate gram occurring in millions of
      docs is still one group);
    - one equi-join of occurrences against the duplicated-gram set (each
      occurrence matches exactly ONE group row — no blow-up on hot
      grams);
    - covered positions are counted with a per-doc distinct over at most
      n_tokens rows.
    Exactness: counts are BIGINT; the single division is round(int/int, 6)
    (the token_rarity-proven pattern)."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    stats = corpus.select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    occ = (
        corpus.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.posexplode(positional_kgrams(F.col("text"), k)).alias(
                "pos0", "gram"
            ),
        )
        .filter(F.col("gram") != "")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            F.md5(F.col("gram")).alias("h"),
        )
    )
    dup = (
        occ.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    dup_occ = occ.join(dup, "h")
    cov = (
        dup_occ.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("pos"),
                    F.least(F.col("pos") + (k - 1), F.col("n_tokens")),
                )
            ).alias("cp"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("cp").alias("covered_tokens"))
    )
    cnt = dup_occ.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dup_grams")
    )
    return (
        stats.join(cov, "doc_id", "left")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_grams"), F.lit(0)).cast("long").alias(
                "dup_grams"
            ),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
            F.round(
                F.coalesce(F.col("covered_tokens"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("coverage"),
        )
    )


def span_coverage_sql(k: int = 8) -> str:
    """DuckDB oracle for span_coverage over the augmented corpus."""
    return f"""WITH {CORPUS_SQL.strip()},
tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM corpus
),
posn AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks,
         unnest(range(1, greatest(len(toks) - {k - 1}, 1) + 1)) AS pos
  FROM tok
),
occ AS (
  SELECT doc_id, n_tokens, CAST(pos AS BIGINT) AS pos,
         md5(array_to_string(list_slice(toks, pos, pos + {k - 1}), ' ')) AS h
  FROM posn
  WHERE array_to_string(list_slice(toks, pos, pos + {k - 1}), ' ') <> ''
),
dup AS (
  SELECT h FROM (
    SELECT h, count(DISTINCT doc_id) AS nd FROM occ GROUP BY 1
  ) WHERE nd >= 2
),
dup_occ AS (SELECT o.* FROM occ o JOIN dup USING (h)),
covp AS (
  SELECT doc_id,
         unnest(range(pos, least(pos + {k - 1}, n_tokens) + 1)) AS cp
  FROM dup_occ
),
cov AS (SELECT doc_id, count(DISTINCT cp) AS covered FROM covp GROUP BY 1),
cnt AS (SELECT doc_id, count(*) AS dup_grams FROM dup_occ GROUP BY 1),
stats AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
SELECT s.doc_id, s.n_tokens,
       CAST(coalesce(c.dup_grams, 0) AS BIGINT) AS dup_grams,
       CAST(coalesce(v.covered, 0) AS BIGINT) AS covered_tokens,
       round(coalesce(v.covered, 0) / greatest(s.n_tokens, 1), 6)
         AS coverage
FROM stats s
LEFT JOIN cov v USING (doc_id)
LEFT JOIN cnt c USING (doc_id)"""


def remove_duplicate_spans(
    corpus: DataFrame, k: int = 8, min_span_len: int = 1
) -> DataFrame:
    """Duplicated-span REMOVAL — the rewrite stage behind
    :func:`span_coverage`'s signal (Lee et al. 2021 exact substring
    dedup, re-expressed without suffix arrays): a k-gram occurring in
    >= 2 distinct documents keeps ONLY its canonical copy (the min
    doc_id, the repo-wide exact-dedup keep policy); every other doc
    drops the token positions its occurrences cover. Token positions of
    the owner doc survive unless another gram owned elsewhere also
    covers them. Output (doc_id, text, n_tokens, n_removed); text is
    the kept tokens re-joined with single spaces (token-level rewrite —
    original whitespace is not preserved, same as the reference
    implementations that operate on token streams).

    ``min_span_len`` matches the paper's span-length semantics (Lee et
    al. cut only substrings of >= 50 tokens; the bare k-gram form
    erases ANY duplicated k-token window, which is far more
    aggressive): covered positions are merged into maximal consecutive
    RUNS per document and only runs of at least ``min_span_len`` tokens
    are erased. The default 1 keeps the k-gram semantics (every covered
    position goes) with an unchanged plan.

    Scale shape — LINEAR like span_coverage, plus the rebuild fold:
    one md5(k-gram)-keyed shuffle for (owner, distinct-doc count), one
    equi-join of occurrences against that group frame (no pair blow-up:
    each occurrence meets exactly one group row), a bounded k-wide
    position explode, an anti-join of the token stream against covered
    positions, and one per-doc collect_list fold ordered by
    sort_array — no windows, no global sort. The run merge is linear
    per-doc array work (run starts by adjacent-element compare, run
    lengths by zipping the start-index list with itself shifted),
    O(covered positions) exactly like the rebuild — no accumulator
    copying (the r9 F.aggregate fold was O(runs²); ADVICE r9)."""
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    stats = corpus.select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    occ = (
        corpus.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.posexplode(positional_kgrams(F.col("text"), k)).alias(
                "pos0", "gram"
            ),
        )
        .filter(F.col("gram") != "")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("pos0") + 1).cast("long").alias("pos"),
            F.md5(F.col("gram")).alias("h"),
        )
    )
    own = (
        occ.groupBy("h")
        .agg(
            F.min("doc_id").alias("owner"),
            F.countDistinct("doc_id").alias("nd"),
        )
        .filter(F.col("nd") >= 2)
        .select("h", "owner")
    )
    erase = occ.join(own, "h").filter(F.col("owner") != F.col("doc_id"))
    covered = erase.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.col("pos"),
                F.least(F.col("pos") + (k - 1), F.col("n_tokens")),
            )
        ).alias("p"),
    ).distinct()
    if min_span_len > 1:
        # merge covered positions into maximal runs per doc (window-free:
        # LINEAR array ops over the sorted position list — the r9
        # F.aggregate fold copied the whole accumulator per element,
        # O(runs²) for fragmented coverage; ADVICE r9) and erase only
        # runs >= min_span_len. Gaps-and-islands without a window: a run
        # STARTS at index i iff i == 0 or ps[i] != ps[i-1] + 1 (one
        # adjacent-element compare each, O(n)); run lengths are the
        # deltas between consecutive start indices (zip start-index list
        # with itself shifted left, O(runs)).
        ps = F.col("ps")
        n = F.size(ps)
        # i == 0 handled via when/otherwise (conditional evaluation is
        # guaranteed for CaseWhen) so the invalid 1-based element_at(ps, 0)
        # is structurally unreachable — not merely skipped by Or
        # short-circuit, which Catalyst is free to rewrite (ADVICE r10).
        start_idx = F.filter(
            F.sequence(F.lit(0).cast("bigint"), (n - 1).cast("bigint")),
            lambda i: F.when(i == F.lit(0), F.lit(True)).otherwise(
                F.element_at(ps, (i + 1).cast("int"))
                != F.element_at(ps, i.cast("int")) + 1
            ),
        )
        next_start = F.concat(
            F.slice(start_idx, F.lit(2), F.size(start_idx)),
            F.array(n.cast("bigint")),
        )
        runs = covered.groupBy("doc_id").agg(
            F.array_sort(F.collect_list("p")).alias("ps")
        ).withColumn(
            "runs",
            F.zip_with(
                start_idx,
                next_start,
                lambda s, e: F.struct(
                    F.element_at(ps, (s + 1).cast("int")).alias("start"),
                    (e - s).cast("bigint").alias("len"),
                ),
            ),
        )
        covered = runs.select(
            "doc_id",
            F.explode(
                F.flatten(
                    F.transform(
                        F.filter(
                            "runs", lambda r: r["len"] >= min_span_len
                        ),
                        lambda r: F.sequence(
                            r["start"], r["start"] + r["len"] - 1
                        ),
                    )
                )
            ).alias("p"),
        )
    tokp = corpus.select(
        "doc_id", F.posexplode(toks).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("p"), "tok")
    kept = tokp.join(covered, ["doc_id", "p"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return stats.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "n_tokens",
        (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
    )


def remove_duplicate_spans_sql(k: int = 8, min_span_len: int = 1) -> str:
    """DuckDB oracle for remove_duplicate_spans over the augmented
    corpus (same occ construction as span_coverage_sql). The
    ``min_span_len`` run filter is gaps-and-islands (the oracle can
    afford the window); emitted only when > 1 so the default stays
    byte-identical to the registered r8 oracle."""
    run_filter = ""
    if min_span_len > 1:
        run_filter = f"""
runs AS (
  SELECT doc_id, p,
         p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
  FROM covered
),
runlen AS (
  SELECT doc_id, grp, count(*) AS len FROM runs GROUP BY 1, 2
),
covered_f AS (
  SELECT r.doc_id, r.p FROM runs r JOIN runlen l USING (doc_id, grp)
  WHERE l.len >= {min_span_len}
),"""
    cov_src = "covered_f" if min_span_len > 1 else "covered"
    return f"""WITH {CORPUS_SQL.strip()},
tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM corpus
),
posn AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks,
         unnest(range(1, greatest(len(toks) - {k - 1}, 1) + 1)) AS pos
  FROM tok
),
occ AS (
  SELECT doc_id, n_tokens, CAST(pos AS BIGINT) AS pos,
         md5(array_to_string(list_slice(toks, pos, pos + {k - 1}), ' ')) AS h
  FROM posn
  WHERE array_to_string(list_slice(toks, pos, pos + {k - 1}), ' ') <> ''
),
own AS (
  SELECT h, min(doc_id) AS owner FROM occ
  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
),
erase AS (
  SELECT o.* FROM occ o JOIN own USING (h) WHERE own.owner <> o.doc_id
),
covered AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT doc_id,
           unnest(range(pos, least(pos + {k - 1}, n_tokens) + 1)) AS p
    FROM erase
  )
),{run_filter}
tokp AS (
  SELECT doc_id, CAST(unnest(range(1, len(toks) + 1)) AS BIGINT) AS p, toks
  FROM tok
),
kept AS (
  SELECT t.doc_id, t.p, t.toks[t.p] AS tok
  FROM tokp t
  LEFT JOIN {cov_src} c ON c.doc_id = t.doc_id AND c.p = t.p
  WHERE c.doc_id IS NULL
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text,
         count(*) AS n_kept
  FROM kept GROUP BY 1
),
stats AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
SELECT s.doc_id, coalesce(r.text, '') AS text, s.n_tokens,
       CAST(s.n_tokens - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
FROM stats s LEFT JOIN rebuilt r USING (doc_id)"""


# --------------------------------------------- paragraph first-wins dedup


def dedup_paragraphs_first_wins(
    docs: DataFrame, text_col: str = "text", sep: str = "\n\n"
) -> DataFrame:
    """Paragraph-level FIRST-OCCURRENCE-WINS dedup (the Dolma/BFF
    paragraph mode: across the whole corpus each distinct paragraph
    survives only at its first occurrence — ordered by (doc_id, pos) —
    and every later repeat is cut, including repeats inside the same
    document). Differs from remove_duplicate_lines (which drops ALL
    occurrences of hot template lines): here the canonical first copy
    is kept, so content is deduplicated, not censored. Blank paragraphs
    (trimmed to '') are structural separators and always survive.

    Returns (doc_id, text, n_paragraphs, n_removed); docs whose every
    paragraph is a later-repeat come back with empty text for the
    caller's quality gate.

    Scale shape: one posexplode (map-only), ONE paragraph-keyed
    min-aggregation shuffle (map-side combine on min(struct(doc_id,
    pos)) — the BFF bloom filter's role, played exactly), one join of
    the paragraphs against the firsts frame (keyed the same, no
    fan-out: one row per distinct paragraph), one doc_id fold via
    sort_array(collect_list) — no windows, no global sort, no driver
    state. At 100 TB the bloom filter this emulates trades exactness
    for memory; the exact form here is a standard shuffle that AQE
    sizes, with the firsts frame bounded by distinct-paragraph count.
    """
    paras = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).withColumn("norm", F.trim(F.col("para")))
    firsts = (
        paras.filter(F.col("norm") != "")
        .groupBy("norm")
        .agg(F.min(F.struct("doc_id", "pos")).alias("first"))
    )
    kept = paras.join(firsts, "norm", "left").filter(
        (F.col("norm") == "")
        | (
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        )
    )
    stats = paras.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paragraphs")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return stats.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "n_paragraphs",
        (F.col("n_paragraphs") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .alias("n_removed"),
    )


def dedup_paragraphs_first_wins_sql(
    corpus_cte: str = "corpus AS (SELECT doc_id, text FROM documents)",
) -> str:
    """DuckDB mirror of :func:`dedup_paragraphs_first_wins` over a CTE
    named ``corpus`` providing (doc_id, text); separator chr(10)chr(10)."""
    return f"""WITH {corpus_cte},
    docs_p AS (
      SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
      FROM corpus
    ),
    paras AS (
      SELECT doc_id, CAST(generate_subscripts(ps, 1) AS BIGINT) AS pos,
             unnest(ps) AS para
      FROM docs_p
    ),
    firsts AS (
      SELECT trim(para) AS norm,
             min({{d: doc_id, p: pos}}) AS first
      FROM paras WHERE trim(para) <> '' GROUP BY 1
    ),
    kept AS (
      SELECT p.doc_id, p.pos, p.para
      FROM paras p LEFT JOIN firsts f ON trim(p.para) = f.norm
      WHERE trim(p.para) = ''
         OR (p.doc_id = f.first.d AND p.pos = f.first.p)
    ),
    rebuilt AS (
      SELECT doc_id,
             string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY 1
    ),
    stats AS (
      SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_paragraphs FROM docs_p
    )
    SELECT s.doc_id, coalesce(r.text, '') AS text, s.n_paragraphs,
           CAST(s.n_paragraphs - coalesce(r.n_kept, 0) AS BIGINT)
             AS n_removed
    FROM stats s LEFT JOIN rebuilt r USING (doc_id)"""
