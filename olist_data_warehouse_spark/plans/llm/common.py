"""Shared helpers/constants used by 2+ LLM query families."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from olist_data_warehouse_spark.operators import (
    bloom,
    components,
    corpus,
    dedup,
    multimodal,
    packing,
    sampling,
    scd,
    similarity,
    skew,
    sketches,
    temporal,
    textops,
)
from olist_data_warehouse_spark.plans.queries import _t, register


def _bucket_sql(salt: str, key: str) -> str:
    return (
        f"('0x' || substr(md5('{salt}|' || CAST({key} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {sampling.N_BUCKETS}"
    )

SQL_NORM_TOKENS = r"""
norm AS (
  SELECT doc_id, lang,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
  FROM documents
),
tok AS (SELECT doc_id, lang, t, string_split(t, ' ') AS toks FROM norm)
""".strip()

_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in textops.STOPWORDS)

SQL_SHINGLES = r"""
shingled AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [t] END AS shingles
  FROM tok
),
sh AS (
  SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shingled
)
""".strip()

SQL_MINHASH = f"""
hashed AS (
  SELECT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
  FROM sh
),
idx AS (SELECT unnest(generate_series(0, 15)) AS hash_idx),
coeff AS (
  SELECT hash_idx,
         CASE WHEN (hash_idx * {dedup.HASH_A_MULT} % 2147483647) % 2 = 0
              THEN (hash_idx * {dedup.HASH_A_MULT} % 2147483647) + 1
              ELSE hash_idx * {dedup.HASH_A_MULT} % 2147483647 END AS a,
         (hash_idx * {dedup.HASH_B_MULT} + {dedup.HASH_B_ADD}) % 2147483647 AS b
  FROM idx
),
signatures AS (
  SELECT doc_id, c.hash_idx,
         min((c.a * h.h + c.b) % 2147483647) AS minhash
  FROM hashed h CROSS JOIN coeff c
  GROUP BY 1, 2
)
""".strip()

def _lang_scores_sql() -> tuple[str, str]:
    score_cols = ",\n       ".join(
        f"CAST(len(list_filter(toks, x -> x IN "
        f"({', '.join(repr(w) for w in ws)}))) AS BIGINT) AS score_{lang}"
        for lang, ws in textops.LANG_MARKERS.items()
    )
    best = ", ".join(f"score_{lang}" for lang in textops.LANG_PRIORITY)
    case = "CASE\n"
    for lang in textops.LANG_PRIORITY:
        case += (
            f"  WHEN score_{lang} = greatest({best}) AND score_{lang} > 0"
            f" THEN '{lang}'\n"
        )
    case += "  ELSE 'und' END"
    return score_cols, case

_SCORE_COLS, _LANG_CASE = _lang_scores_sql()

_COS_SQL = (
    "round(list_dot_product(list_transform({a}, x -> x::DOUBLE), "
    "list_transform({b}, x -> x::DOUBLE)) / "
    "(sqrt(list_dot_product(list_transform({a}, x -> x::DOUBLE), "
    "list_transform({a}, x -> x::DOUBLE))) * "
    "sqrt(list_dot_product(list_transform({b}, x -> x::DOUBLE), "
    "list_transform({b}, x -> x::DOUBLE)))), 4)"
)

def _lsh_bucket_sql(
    emb: str, plane_offset: int = 0, n_planes: int = similarity.LSH_N_PLANES
) -> str:
    """DuckDB twin of similarity.lsh_bucket / lsh_band_buckets[b]:
    identical plane weights, identical left-to-right double
    accumulation, identical sign bits. ``plane_offset`` selects a band's
    plane range (band b = offset b·r, width r); bit i of the bucket is
    plane offset+i."""
    terms = []
    for i in range(n_planes):
        p = plane_offset + i
        dot = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(generate_series(1, len({emb})), j -> "
            f"CAST({emb}[j] AS DOUBLE) * "
            f"((({p * 1024} + (j - 1)) * {similarity.LSH_MULT} "
            f"% {similarity.LSH_MOD}) / {similarity.LSH_MOD}.0 - 0.5))), "
            "(a, x) -> a + x)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << i} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"

_EMB_LSH_BANDS = 8

_EMB_LSH_PLANES_PER_BAND = 8

_EMB_LSH_MAX_BUCKET = 1024

_EMB_LSH_BUCKETS_SQL = "\nUNION ALL\n".join(
    f"SELECT vec_id, {b} AS band, "
    + _lsh_bucket_sql(
        "embedding", b * _EMB_LSH_PLANES_PER_BAND, _EMB_LSH_PLANES_PER_BAND
    )
    + " AS bucket FROM embeddings"
    for b in range(_EMB_LSH_BANDS)
)

_SQL_LSH_EDGES = """
buckets AS (
  SELECT doc_id, CAST(hash_idx // 4 AS INT) AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_idx))
           AS band_digest
  FROM signatures
  GROUP BY doc_id, CAST(hash_idx // 4 AS INT)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.band_digest = b.band_digest
  WHERE a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
)
""".strip()
