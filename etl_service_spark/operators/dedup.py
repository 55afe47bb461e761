"""Deduplication operator family for a training-data pipeline.

Five dedup strategies over the ``documents`` table, each expressed as a
single declarative Spark plan (and a structurally identical DuckDB
oracle via the shared bi-engine template):

- exact          — hash-groupBy on the full text (one shuffle on a
                   30-bit key; at 100 TB this is the canonical
                   map-side-combine aggregation).
- ngram_jaccard  — exact Jaccard over word-3-gram shingle sets, but
                   computed via an INVERTED INDEX self-join (explode
                   shingles → join on shingle → count common), not an
                   O(N²) cross join: any pair with Jaccard > 0 shares a
                   shingle, so the index join is lossless. Hot shingles
                   are the skew risk at scale → AQE skew-join handles
                   the head; a stopword-shingle filter would cap it.
- minhash_lsh    — K=16 minhash signature (portable hash), 8 bands × 2
                   rows; candidate pairs = bucket collisions; verified
                   with exact Jaccard. The scale path: cost is
                   O(N·K + collisions), never O(N²).
- simhash        — 30-bit simhash fingerprint from token hashes
                   (weighted bit votes); equal fingerprints → dup
                   candidates.
- embedding cosine near-dup lives in similarity.py.

All hash arithmetic is exact 64-bit integer math from the portable
library — bit-identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import portable as P

# ------------------------------------------------------------ fragments
TOKENS = (P.spark_tokens("text"), P.duck_tokens("text"))
SHINGLES = (
    P.spark_shingles(P.spark_tokens("text")),
    P.duck_shingles(P.duck_tokens("text")),
)
TEXT_HASH = (P.spark_poly_hash("lower(text)"), P.duck_poly_hash("lower(text)"))
# hash every shingle of an in-scope array column `s`: array<string> → array<bigint>
# (outer lambda var `q` avoids colliding with the poly-hash's inner `x`)
HASHED_SHINGLES = (
    f"transform(s, q -> {P.spark_poly_hash('q')})",
    f"list_transform(s, q -> {P.duck_poly_hash('q')})",
)
ARR_LEN = ("size", "len")
EXPLODE = ("explode", "unnest")
ARR_MIN = ("array_min", "list_min")


# ---------------------------------------------------------- exact dedup
EXACT_TEMPLATE = """
SELECT h AS text_hash,
       MIN(doc_id) AS keeper_id,
       COUNT(*) AS n_copies
FROM (SELECT doc_id, {text_hash} AS h FROM {view}) t
GROUP BY h
"""


def exact_dedup_sql(view: str = "documents") -> tuple[str, str]:
    return P.bi_sql(EXACT_TEMPLATE, text_hash=TEXT_HASH, view=view)


def exact_dedup(spark: SparkSession) -> DataFrame:
    return spark.sql(exact_dedup_sql()[0])


# ------------------------------------------- n-gram Jaccard (inverted index)
JACCARD_TEMPLATE = """
WITH sh AS (
  SELECT doc_id, {shingles} AS s FROM {view}
),
sized AS (
  SELECT doc_id, s, {arr_len}(s) AS n FROM sh WHERE {arr_len}(s) > 0
),
posting AS (
  SELECT doc_id, n, {explode}(s) AS shingle FROM sized
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.n AS na, b.n AS nb, COUNT(*) AS c
  FROM posting a JOIN posting b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id, a.n, b.n
)
SELECT doc_a, doc_b,
       CAST(c AS DOUBLE) / (na + nb - c) AS jaccard
FROM common
WHERE CAST(c AS DOUBLE) / (na + nb - c) >= {tau}
"""


def ngram_jaccard_sql(tau: float = 0.8, view: str = "documents") -> tuple[str, str]:
    return P.bi_sql(
        JACCARD_TEMPLATE,
        shingles=SHINGLES,
        arr_len=ARR_LEN,
        explode=EXPLODE,
        view=view,
        tau=str(tau),
    )


def ngram_jaccard_pairs(spark: SparkSession, tau: float = 0.8) -> DataFrame:
    return spark.sql(ngram_jaccard_sql(tau)[0])


# ------------------------------------------------------------ minhash LSH
def _sig_exprs(k: int) -> str:
    outs = []
    for i, (a, b) in enumerate(P.minhash_params(k)):
        outs.append(
            f"coalesce({{arr_min}}({{transform}}(hs, h -> ({a} * h + {b}) % {P.HASH_MOD})), -1) AS sig_{i}"
        )
    return ",\n         ".join(outs)


def minhash_lsh_sql(
    k: int = 16,
    bands: int = 8,
    tau: float = 0.8,
    view: str = "documents",
) -> tuple[str, str]:
    """Full minhash+LSH pipeline; the oracle replicates the MECHANISM
    (not just exhaustive Jaccard), so the match is exact regardless of
    LSH recall."""
    rows = k // bands
    band_selects = "\nUNION ALL\n".join(
        "SELECT doc_id, {b} AS band_id, concat({cols}) AS band_key FROM sig".format(
            b=b,
            cols=", '_', ".join(f"sig_{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    template = (
        """
WITH sh AS (
  SELECT doc_id, {shingles} AS s FROM {view}
),
hashed AS (
  SELECT doc_id, s, {hashed_shingles} AS hs, {arr_len}(s) AS n
  FROM sh WHERE {arr_len}(s) > 0
),
sig AS (
  SELECT doc_id,
         """
        + _sig_exprs(k)
        + """
  FROM hashed
),
bands AS (
"""
        + band_selects
        + """
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
verified AS (
  SELECT c.doc_a, c.doc_b,
         CAST({arr_len}({arr_intersect}(x.s, y.s)) AS DOUBLE)
           / (x.n + y.n - {arr_len}({arr_intersect}(x.s, y.s))) AS jaccard
  FROM cand c
  JOIN hashed x ON x.doc_id = c.doc_a
  JOIN hashed y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {tau}
"""
    )
    return P.bi_sql(
        template,
        shingles=SHINGLES,
        hashed_shingles=HASHED_SHINGLES,
        arr_len=ARR_LEN,
        arr_min=ARR_MIN,
        arr_intersect=("array_intersect", "list_intersect"),
        transform=("transform", "list_transform"),
        view=view,
        tau=str(tau),
    )


def minhash_lsh_pairs(spark: SparkSession, k: int = 16, bands: int = 8, tau: float = 0.8) -> DataFrame:
    return spark.sql(minhash_lsh_sql(k, bands, tau)[0])


# --------------------------------------------------------------- simhash
def simhash_sql(bits: int = 30, view: str = "documents") -> tuple[str, str]:
    """Per-doc simhash fingerprint: explode tokens (multiplicity =
    weight), hash each, vote per bit, assemble fingerprint as
    Σ bit_j · 2^j. One explode + one groupBy — the same shuffle profile
    as a word count, so it scales linearly."""
    votes = ",\n         ".join(
        f"SUM(2 * {P.bit_probe('h', j)} - 1) AS v{j}" for j in range(bits)
    )
    fp = " + ".join(f"(CASE WHEN v{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(bits))
    template = (
        """
WITH tok AS (
  SELECT doc_id, {explode}({tokens}) AS t FROM {view}
),
hashed AS (
  SELECT doc_id, {tok_hash} AS h FROM tok
),
votes AS (
  SELECT doc_id,
         """
        + votes
        + """
  FROM hashed
  GROUP BY doc_id
)
SELECT doc_id, CAST("""
        + fp
        + """ AS BIGINT) AS simhash
FROM votes
"""
    )
    return P.bi_sql(
        template,
        explode=EXPLODE,
        tokens=TOKENS,
        tok_hash=(P.spark_poly_hash("t"), P.duck_poly_hash("t")),
        view=view,
    )


def simhash(spark: SparkSession, bits: int = 30) -> DataFrame:
    return spark.sql(simhash_sql(bits)[0])
