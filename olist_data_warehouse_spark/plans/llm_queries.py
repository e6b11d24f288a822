"""LLM-data-pipeline queries: dedup / similarity / text analysis.

Registers the extended operators (BASELINE.json north star) into the
same REGISTRY as the reference-parity queries, each with a DuckDB
oracle twin where expressible. Portability invariants used throughout:

- normalize: ``regexp_replace(lower(trim(x)), '\\s+', ' ')`` — DuckDB
  needs the ``'g'`` flag to match Spark's replace-all default.
- portable 32-bit hash: first 8 md5 hex digits as int (verified
  identical: Spark ``conv(_,16,10)`` ≡ DuckDB ``('0x'||_)::BIGINT``).
- float math: DuckDB ``list_dot_product`` accumulates FLOAT[] in
  single precision; the oracles cast lists to DOUBLE first, which then
  matches Spark's left-to-right double `aggregate` exactly (verified
  to 0 ulp on the test vectors; both sides still round to 4dp).
"""

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

# ---------------------------------------------------------------------------
# Shared oracle fragments
# ---------------------------------------------------------------------------

# DuckDB twin of sampling.hash_bucket: salted portable 32-bit hash mod
# the bucket count.
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


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle=f"""
WITH {SQL_NORM_TOKENS}
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(ceil(length(t) / 4.0) AS BIGINT) AS bpe_est,
       md5(t) AS fingerprint
FROM tok
""",
    doc="Token counting (whitespace + BPE-ish chars/4 estimate) and "
    "rolling document fingerprint (md5 of normalized text). All "
    "Catalyst built-ins: one narrow pass, no shuffle.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        textops.token_count("text").alias("n_tokens"),
        textops.bpe_token_estimate("text").alias("bpe_est"),
        textops.fingerprint("text").alias("fingerprint"),
    )


@register(
    "text_rolling_fingerprint",
    oracle=f"""
WITH {SQL_NORM_TOKENS}
SELECT doc_id,
       CASE WHEN t IS NULL THEN NULL ELSE
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(toks,
             t -> ('0x' || substr(md5(t), 1, 8))::BIGINT % 2147483647)),
         (acc, h) -> (acc * {textops.ROLL_BASE} + h) % {textops.ROLL_MOD})
       END AS roll_hash
FROM tok
""",
    doc="Document fingerprinting via Rabin-Karp polynomial rolling hash "
    "over the token stream — order-sensitive and O(1)-incremental per "
    "appended token. Single narrow pass, no shuffle, no UDF. NULL "
    "text fingerprints as NULL on both sides (null_fuzz_sweep).",
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id", textops.rolling_hash("text").alias("roll_hash")
    )


@register(
    "text_quality",
    oracle=f"""
WITH {SQL_NORM_TOKENS}
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       round((length(t) - (len(toks) - 1)) / CAST(len(toks) AS DOUBLE), 4)
         AS mean_token_len,
       round(CAST(len(list_filter(toks, x -> x IN ({_STOPWORDS_SQL})))
                  AS BIGINT) / CAST(len(toks) AS DOUBLE), 4) AS stopword_ratio,
       round(CAST(length(regexp_replace(t, '[a-z0-9 ]', '', 'g')) AS BIGINT)
             / CAST(length(t) AS DOUBLE), 4) AS punct_ratio
FROM tok
""",
    doc="Quality scoring: length/stopword/punctuation signals per doc "
    "(the standard pre-training quality-filter features).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    feats = textops.quality_features("text")
    return d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["mean_token_len"].alias("mean_token_len"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["punct_ratio"].alias("punct_ratio"),
    )


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


@register(
    "text_lang_id",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
scored AS (
  SELECT doc_id, lang,
       {_SCORE_COLS}
  FROM tok
)
SELECT doc_id, lang AS lang_labeled,
       {_LANG_CASE} AS lang_pred
FROM scored
""",
    doc="Language ID: stopword-marker n-gram heuristic with "
    "deterministic argmax/tie-break — per-row expression, no shuffle.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        textops.lang_id("text").alias("lang_pred"),
    )


@register(
    "text_repetition_ratio",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES}
SELECT s.doc_id,
       CASE WHEN k.t IS NULL THEN NULL ELSE
         round(1.0 - len(list_distinct(k.toks))
                     / CAST(len(k.toks) AS DOUBLE), 4) END
         AS dup_token_ratio,
       CASE WHEN k.t IS NULL THEN NULL ELSE
         round(1.0 - len(list_distinct(s.shingles))
                     / CAST(len(s.shingles) AS DOUBLE), 4) END
         AS dup_shingle_ratio
FROM shingled s JOIN tok k USING (doc_id)
""",
    doc="Within-document repetition quality filter (Gopher-style): "
    "fraction of duplicate tokens and duplicate 3-word shingles per "
    "doc. Pure array expressions (array_distinct over the token/"
    "shingle arrays) — no explode, no shuffle; pipelines into the "
    "corpus scan at any scale.",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    feats = textops.repetition_features("text")
    # Missing text has no repetition score — NULL through, pinned on
    # both sides (the tokenizer's ''-coalesce would otherwise score a
    # NULL doc as a zero-duplication singleton; null_fuzz_sweep).
    has_text = F.col("text").isNotNull()
    return d.select(
        "doc_id",
        F.when(has_text, feats["dup_token_ratio"]).alias(
            "dup_token_ratio"
        ),
        F.when(has_text, feats["dup_shingle_ratio"]).alias(
            "dup_shingle_ratio"
        ),
    )


# Deterministic PII injection shared by the Spark and oracle sides of
# text_pii_redact: the synthetic corpus contains no PII, so both
# engines append the same emails/phones to the same rows, then the
# operator under test must find and redact them identically.
_PII_INJECT_SQL = """
injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
                THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR)
                     || '@mail.example.com'
              WHEN doc_id % 7 = 0
                THEN text || ' call 555-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     || ' now'
              ELSE text END AS t
  FROM documents
)
""".strip()


@register(
    "text_pii_redact",
    oracle=f"""
WITH {_PII_INJECT_SQL}
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{textops.EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(t, '{textops.PHONE_RE}')) AS BIGINT)
         AS n_phones,
       md5(regexp_replace(
             regexp_replace(t, '{textops.EMAIL_RE}', '<EMAIL>', 'g'),
             '{textops.PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
FROM injected
""",
    doc="PII detection + redaction: regexp_count/regexp_replace over "
    "email and phone patterns restricted to Java-regex/RE2-shared "
    "syntax, verified via md5 of the redacted text. Seeded PII "
    "(deterministic per-doc_id injection, identical on both engines) "
    "exercises the match path. Narrow codegen'd pass, no shuffle.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    injected = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                "text",
                F.lit(" reach me at user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                "text",
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" now"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    counts = textops.pii_counts("t")
    return injected.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        F.md5(textops.pii_redact("t")).alias("redacted_fp"),
    )


@register(
    "pipe_corpus_curation",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
scored AS (
  SELECT doc_id, t, toks,
       {_SCORE_COLS}
  FROM tok
),
feats AS (
  SELECT doc_id, t,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         round(CAST(len(list_filter(toks, x -> x IN ({_STOPWORDS_SQL})))
                    AS BIGINT) / CAST(len(toks) AS DOUBLE), 4)
           AS stopword_ratio,
         {_LANG_CASE} AS lang_pred,
         md5(t) AS fingerprint
  FROM scored
),
kept AS (
  SELECT * FROM feats
  WHERE n_tokens >= 30 AND stopword_ratio >= 0.03 AND lang_pred = 'en'
),
canon AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint
                                 ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT doc_id, n_tokens, lang_pred,
       CASE WHEN b < 8000 THEN 'train'
            WHEN b < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT *, {_bucket_sql("split", "doc_id")} AS b FROM canon)
""",
    doc="The LLM-data pipeline end-to-end, as ONE composed plan: "
    "quality filter (length + stopword ratio) → language filter "
    "(lang_id = en) → exact dedup (min doc_id per content digest) → "
    "deterministic train/val/test split. Everything before the dedup "
    "window is a codegen'd narrow pass over the corpus — one shuffle "
    "total (on the digest), split membership is partition-invariant, "
    "and each stage is the already-oracle-verified operator reused "
    "unchanged. This is the composition a 100 TB curation job runs.",
)
def pipe_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")["documents"]
    feats = textops.quality_features("text")
    scored = d.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        textops.lang_id("text").alias("lang_pred"),
        textops.fingerprint("text").alias("fingerprint"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= 30)
        & (F.col("stopword_ratio") >= 0.03)
        & (F.col("lang_pred") == "en")
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    canon = (
        kept.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    split = sampling.hash_split(
        canon, F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return split.select("doc_id", "n_tokens", "lang_pred", "split")


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle=r"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
  FROM documents
)
SELECT min(doc_id) AS doc_id, fingerprint FROM fp GROUP BY fingerprint
""",
    doc="Exact dedup: hash-groupBy on normalized-content digest, min "
    "doc_id survives. One shuffle of (digest, id); text never moves.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return dedup.exact_dedup(d)


@register(
    "dedup_exact_groups",
    oracle=r"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 50
),
fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
  FROM all_docs
)
SELECT fingerprint, min(doc_id) AS canonical_doc_id, count(doc_id) AS n_dups
FROM fp GROUP BY fingerprint HAVING count(doc_id) > 1
""",
    doc="Duplicate-group detection, exercised on a corpus with seeded "
    "dups (docs 0-49 duplicated under shifted ids).",
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    with_dups = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    return dedup.exact_duplicate_groups(with_dups)


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
shh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
  FROM sh
),
kept AS (SELECT h FROM shh GROUP BY h HAVING count(*) <= 100),
shf AS (SELECT shh.doc_id, shh.h FROM shh JOIN kept USING (h)),
sizes AS (SELECT doc_id, count(h) AS set_size FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(a.h) AS n_inter
  FROM shf a JOIN shf b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter / CAST(sa.set_size + sb.set_size - n_inter AS DOUBLE), 4)
         AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / CAST(sa.set_size + sb.set_size - n_inter AS DOUBLE), 4)
      >= 0.12
""",
    doc="n-gram Jaccard near-dup pairs (3-word shingles, thr 0.12) "
    "WITH the shingle-DF skew cap on (df ≤ 100): a stop-shingle shared "
    "by every doc would hot-spot the self-join into one reducer — the "
    "cap drops it before the join, in both engines, exactly like "
    "stop-word removal. At 100 TB this runs as the verify stage behind "
    "LSH; the cap is what makes the standalone form survivable.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return dedup.ngram_jaccard_pairs(d, k=3, threshold=0.12, max_shingle_df=100)


@register(
    "dedup_containment",
    oracle=r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         substr(text, 1, CAST(floor(length(text) / 2) AS INT)) AS text
  FROM documents WHERE doc_id < 40
),
norm AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
  FROM corpus
),
tok AS (SELECT doc_id, t, string_split(t, ' ') AS toks FROM norm),
shingled AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [t] END AS shingles
  FROM tok
),
sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS shingle FROM shingled),
shh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
  FROM sh
),
kept AS (SELECT h FROM shh GROUP BY h HAVING count(*) <= 100),
shf AS (SELECT shh.doc_id, shh.h FROM shh JOIN kept USING (h)),
sizes AS (SELECT doc_id, count(h) AS set_size FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(a.h) AS n_inter
  FROM shf a JOIN shf b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_inter / CAST(least(sa.set_size, sb.set_size) AS DOUBLE), 4)
         AS containment
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(n_inter / CAST(least(sa.set_size, sb.set_size) AS DOUBLE), 4)
      >= 0.6
""",
    doc="Shingle CONTAINMENT dedup |A∩B|/min(|A|,|B|) ≥ 0.6 — the "
    "near-superset pass Jaccard structurally misses (a doc embedded "
    "verbatim in a longer one scores Jaccard ≈ |A|/|B| → 0 but "
    "containment ≈ 1). Exercised on a corpus with seeded crops: the "
    "first half of docs 0-39 re-enters under shifted ids, and every "
    "crop must surface against its source. Same hashed-shingle core, "
    "DF-100 skew cap, and plan shape as dedup_ngram_jaccard "
    "(operators/dedup.py:_shingle_pair_stats — shared verifier core); "
    "at 100 TB both run as the verify stage behind LSH discovery.",
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    crops = d.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.expr(
            "substring(text, 1, CAST(floor(length(text) / 2) AS INT))"
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(crops)
    return dedup.containment_pairs(
        corpus, k=3, threshold=0.6, max_shingle_df=100
    )


@register(
    "dedup_minhash_signatures",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
{SQL_MINHASH}
SELECT doc_id, CAST(hash_idx AS INT) AS hash_idx, minhash FROM signatures
""",
    doc="MinHash signatures (16 Carter-Wegman permutations mod 2^31-1 "
    "over portable md5-based shingle hashes) — bit-for-bit reproducible "
    "in the oracle. Two compact shuffles; no UDFs.",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return dedup.minhash_signatures(d, num_hashes=16, k=3).select(
        "doc_id", F.col("hash_idx").cast("int").alias("hash_idx"), "minhash"
    )


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
{SQL_MINHASH},
buckets AS (
  SELECT doc_id, CAST(hash_idx // 4 AS INT) AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_idx))
           AS band_digest
  FROM signatures
  GROUP BY doc_id, CAST(hash_idx // 4 AS INT)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM buckets a
JOIN buckets b ON a.band = b.band AND a.band_digest = b.band_digest
WHERE a.doc_id < b.doc_id
""",
    doc="MinHash-LSH candidate pairs (16 hashes, 4 bands × 4 rows): "
    "docs meet only within equal band digests — the discovery stage "
    "that replaces the quadratic join at scale.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return dedup.minhash_lsh_candidates(d, num_hashes=16, rows_per_band=4, k=3)


@register(
    "dedup_simhash",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
tokens_flat AS (
  SELECT doc_id, unnest(toks) AS token FROM tok
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
  FROM tokens_flat
),
votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bit)
  GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
""",
    doc="SimHash (32-bit): per-token bit votes; near-dups land within "
    "small hamming distance. Relational form for parity; the scale "
    "path computes the same per-partition with an Arrow batch.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return dedup.simhash(d, bits=32)


@register(
    "dedup_simhash_hamming",
    oracle=r"""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         text || ' extra trailing words appended here' AS text
  FROM documents WHERE doc_id < 50
),
norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
  FROM all_docs
),
tok AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
tokens_flat AS (SELECT doc_id, unnest(toks) AS token FROM tok),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
  FROM tokens_flat
),
votes AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (h >> bit) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bit)
  GROUP BY doc_id, bit
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id
),
bands AS (
  SELECT doc_id, simhash, band, (simhash >> (8 * band)) & 255 AS val
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3
""",
    doc="COMPLETE hamming-<=3 SimHash near-dup search via pigeonhole "
    "banding: signatures within hamming k < n_bands must agree exactly "
    "on >=1 of the 4 byte-bands, so the (band, value) equi-join finds "
    "every qualifying pair — exact search in hash-join shape, no "
    "nested loop, no approximation. Exercised on a corpus with seeded "
    "near-dups (docs 0-49 re-appended with a short suffix under "
    "shifted ids); the signature rides the join so verify needs no "
    "second lookup.",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    with_dups = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(
                "text", F.lit(" extra trailing words appended here")
            ).alias("text"),
        )
    )
    return dedup.simhash_hamming_pairs(with_dups, max_hamming=3, n_bands=4)


@register(
    "decon_ngram_overlap",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
hits AS (
  SELECT t.doc_id,
         CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM train t LEFT JOIN bench b ON t.shingle = b.shingle
  GROUP BY t.doc_id
)
SELECT doc_id, n_shingles, n_hits,
       round(n_hits / CAST(n_shingles AS DOUBLE), 4) AS contamination
FROM hits
""",
    doc="Benchmark decontamination: per-training-doc fraction of "
    "distinct 3-word shingles that also occur in a held-out benchmark "
    "set (docs with doc_id % 97 == 0 stand in for the eval corpus). "
    "Bench shingles broadcast (eval corpora are tiny vs. the corpus); "
    "per-doc shingle dedup happens in array land with no exchange; the "
    "one shuffle carries a single row per document after map-side "
    "partial agg.",
)
def decon_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    return dedup.benchmark_contamination(train, bench, k=3)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COS_SQL = (
    "round(list_dot_product(list_transform({a}, x -> x::DOUBLE), "
    "list_transform({b}, x -> x::DOUBLE)) / "
    "(sqrt(list_dot_product(list_transform({a}, x -> x::DOUBLE), "
    "list_transform({a}, x -> x::DOUBLE))) * "
    "sqrt(list_dot_product(list_transform({b}, x -> x::DOUBLE), "
    "list_transform({b}, x -> x::DOUBLE)))), 4)"
)


@register(
    "sim_bruteforce_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cos_sim
FROM ranked WHERE rn <= 10
""",
    doc="Brute-force cosine top-10 for 5 query vectors: exact ANN "
    "baseline. Queries broadcast; corpus streams once; JVM-side "
    "zip_with/aggregate dot products (no Python).",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.brute_force_topk(e, [0, 1, 2, 3, 4], k=10)


# dedup_embedding_cosine (all-pairs) is deliberately NOT registered: an
# inequality self-join plans as a nested loop — O(n²) scored pairs — so
# it exists only as the pytest recall baseline for the bucketed form
# below (tests/test_similarity.py). The registered op composes banded
# LSH discovery with the exact-cosine verify, the shape that survives
# 100 TB.


@register(
    "sim_ivf_assign",
    oracle=f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < 8
),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         {_COS_SQL.format(a="e.embedding", b="c.c_emb")} AS cos_sim
  FROM embeddings e CROSS JOIN c
),
ranked AS (
  SELECT vec_id, centroid_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, centroid_id) AS rn
  FROM scored
)
SELECT vec_id, centroid_id, cos_sim FROM ranked WHERE rn = 1
""",
    doc="IVF assignment: nearest of 8 deterministic seed centroids per "
    "vector — at scale this becomes the bucketing key so queries touch "
    "~1/C of the corpus.",
)
def sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.ivf_assign(e, n_centroids=8)


@register(
    "sim_ivf_topk",
    oracle=f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < 8
),
assign_scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_COS_SQL.format(a="e.embedding", b="c.c_emb")} AS cos_sim
  FROM embeddings e CROSS JOIN c
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, centroid_id
  FROM assigned WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS cos_sim
  FROM assigned e JOIN q ON e.centroid_id = q.centroid_id
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cos_sim
FROM ranked WHERE rn <= 10
""",
    doc="IVF top-10: search restricted to the query's centroid bucket — "
    "the approximate scale path (recall tunable via bucket count / "
    "multi-probe).",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.ivf_topk(e, [0, 1, 2, 3, 4], k=10, n_centroids=8)


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary payload -> typed metadata)
# ---------------------------------------------------------------------------


@register(
    "multi_decode_meta",
    oracle="""
SELECT doc_id AS item_id,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE octet_length(encode(
         'FAKEIMG|' || CAST(doc_id % 64 + 16 AS VARCHAR) || '|'
                    || CAST(doc_id % 48 + 16 AS VARCHAR) || '|3|'
                    || substr(text, 1, 64))) END AS INT) AS byte_len,
       text IS NOT NULL AS is_valid,
       CAST(CASE WHEN text IS NULL THEN 0
                 ELSE doc_id % 64 + 16 END AS INT) AS width,
       CAST(CASE WHEN text IS NULL THEN 0
                 ELSE doc_id % 48 + 16 END AS INT) AS height,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE 3 END AS INT) AS channels
FROM documents
""",
    doc="Multimodal decode stage end-to-end: deterministic fake image "
    "payloads built as a binary column (opaque bytes + typed metadata "
    "design), sharded by id-hash for size-skew-uniform tasks, decoded "
    "via the Arrow-batched mapInPandas kernel. The oracle recomputes "
    "the metadata analytically — checking the binary plumbing, batch "
    "shape, and schema, not a codec. A NULL payload (null source "
    "text) decodes as an INVALID row — zeros + is_valid false, the "
    "kernel contract — mirrored in the oracle (null_fuzz_sweep).",
)
def multi_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    w = (F.col("doc_id") % 64 + 16).cast("int")
    h = (F.col("doc_id") % 48 + 16).cast("int")
    payload = F.concat(
        F.lit("FAKEIMG|"), w.cast("string"), F.lit("|"),
        h.cast("string"), F.lit("|3|"), F.substring("text", 1, 64),
    ).cast("binary")
    images = d.select(F.col("doc_id").alias("item_id"), payload.alias("payload"))
    meta = multimodal.decode_image_meta(
        multimodal.shard_for_decode(images)
    )
    return meta.select(
        "item_id", "byte_len", "is_valid", "width", "height",
        F.col("channels").cast("int").alias("channels"),
    )


def _fake_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → deterministic fake image payloads (shared by the
    multimodal stage queries; dims re-derivable analytically by the
    oracle: width = doc_id%64+16, height = doc_id%48+16, 3 channels,
    body = first 64 chars of text as UTF-8 bytes)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    w = (F.col("doc_id") % 64 + 16).cast("int")
    h = (F.col("doc_id") % 48 + 16).cast("int")
    payload = F.concat(
        F.lit("FAKEIMG|"), w.cast("string"), F.lit("|"),
        h.cast("string"), F.lit("|3|"), F.substring("text", 1, 64),
    ).cast("binary")
    return d.select(F.col("doc_id").alias("item_id"), payload.alias("payload"))


@register(
    "multi_extract_features",
    oracle="""
WITH vecs AS (
  SELECT doc_id AS item_id,
         [CAST(doc_id % 64 + 16 AS DOUBLE),
          CAST(doc_id % 48 + 16 AS DOUBLE),
          3.0,
          CAST(octet_length(encode(
            'FAKEIMG|' || CAST(doc_id % 64 + 16 AS VARCHAR) || '|'
                       || CAST(doc_id % 48 + 16 AS VARCHAR) || '|3|'
                       || substr(text, 1, 64))) AS DOUBLE),
          CAST(doc_id % 64 + 16 AS DOUBLE) / CAST(doc_id % 48 + 16 AS DOUBLE)
         ] AS features
  FROM documents
  WHERE text IS NOT NULL
)
SELECT item_id,
       CAST(unnest(generate_series(1, len(features))) - 1 AS INT) AS dim_idx,
       unnest(features) AS value
FROM vecs
""",
    doc="Multimodal feature-extract stage: binary payload → "
    "array<double> embedding column via the Arrow-batched mapInPandas "
    "kernel (a vision model's slot at scale). The fake codec's "
    "descriptor is analytic over the header, so the oracle re-derives "
    "the exact vector. Registered output is the vector exploded to "
    "(item_id, dim_idx, value) rows — scalar cells hash portably; the "
    "array form itself is pinned in tests/test_multimodal.py.",
)
def multi_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    images = _fake_images(spark, sf_dir)
    feats = multimodal.extract_features(
        multimodal.shard_for_decode(images)
    )
    return feats.select(
        "item_id", F.posexplode("features").alias("dim_idx", "value")
    )


@register(
    "multi_resize_meta",
    oracle="""
SELECT doc_id AS item_id,
       CAST(CASE WHEN text IS NULL THEN 0
            ELSE octet_length(encode('FAKEIMG|4|4|3|'))
                 + least(octet_length(encode(substr(text, 1, 64))), 48)
            END AS INT) AS byte_len,
       text IS NOT NULL AS is_valid,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE 4 END AS INT) AS width,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE 4 END AS INT) AS height,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE 3 END AS INT) AS channels
FROM documents
""",
    doc="Multimodal resize stage: binary in → binary out with the "
    "header rewritten to the target dims and the body truncated to "
    "width*height*channels bytes, then re-decoded. The oracle "
    "recomputes the post-resize byte length analytically, so the "
    "binary-to-binary kernel is value-checked, not just shape-checked.",
)
def multi_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    images = _fake_images(spark, sf_dir)
    resized = multimodal.resize_images(images, 4, 4)
    meta = multimodal.decode_image_meta(resized)
    return meta.select(
        "item_id", "byte_len", "is_valid", "width", "height",
        F.col("channels").cast("int").alias("channels"),
    )


@register(
    "multi_frame_sample",
    oracle="""
SELECT doc_id AS item_id, CAST(f AS INT) AS frame_idx,
       32 AS width, 24 AS height
FROM documents,
     unnest(generate_series(0, CAST(doc_id % 10 AS BIGINT), 3)) AS t(f)
WHERE text IS NOT NULL
""",
    doc="Multimodal frame-sample stage: one FAKEVID payload row fans "
    "out to one row per sampled frame (every 3rd of n_frames = "
    "doc_id%10+1) via mapInPandas — the one-to-many batch shape an "
    "ffmpeg stage needs. Oracle = generate_series over the same "
    "analytic frame counts.",
)
def multi_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    n_frames = (F.col("doc_id") % 10 + 1).cast("int")
    payload = F.concat(
        F.lit("FAKEVID|"), n_frames.cast("string"), F.lit("|32|24|"),
        F.substring("text", 1, 32),
    ).cast("binary")
    videos = d.select(F.col("doc_id").alias("item_id"), payload.alias("payload"))
    return multimodal.sample_frames(
        multimodal.shard_for_decode(videos), every_n=3
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes)
# ---------------------------------------------------------------------------


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


@register(
    "sim_lsh_assign",
    oracle=f"""
SELECT vec_id, {_lsh_bucket_sql("embedding")} AS bucket
FROM embeddings
""",
    doc="Random-hyperplane LSH bucket assignment: bit-packed sign "
    "signature per vector. The bucket id is the partition key at scale "
    "(write corpus bucketed by it; a probe touches one bucket). One "
    "narrow pass, no shuffle, no UDF.",
)
def sim_lsh_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.lsh_assign(e)


@register(
    "sim_lsh_topk",
    oracle=f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql("embedding")} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, bucket
  FROM bucketed WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS cos_sim
  FROM bucketed e JOIN q ON e.bucket = q.bucket
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cos_sim
FROM ranked WHERE rn <= 10
""",
    doc="LSH-bucketed approximate top-10: candidates restricted to the "
    "query's hyperplane bucket — the LSH counterpart of sim_ivf_topk "
    "(recall tuned by plane count / multi-probe).",
)
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.lsh_topk(e, [0, 1, 2, 3, 4], k=10)


# 8 bands × 8 planes: 256 buckets per band keeps bucket sizes (and so
# the per-band C(size,2) candidate volume) bounded as the corpus grows;
# the extra bands recover the recall the finer buckets give up
# (recall@cos0.9 ≈ 1-(1-0.856^8)^8 ≈ 93%). The previous 4×4 shape made
# candidates ~24% of ALL pairs at sf0.1 — quadratic, not bucketed.
_EMB_LSH_BANDS = 8
_EMB_LSH_PLANES_PER_BAND = 8
# Skew fuse only — at these shapes mean bucket size is |corpus|/256.
_EMB_LSH_MAX_BUCKET = 1024

_EMB_LSH_BUCKETS_SQL = "\nUNION ALL\n".join(
    f"SELECT vec_id, {b} AS band, "
    + _lsh_bucket_sql(
        "embedding", b * _EMB_LSH_PLANES_PER_BAND, _EMB_LSH_PLANES_PER_BAND
    )
    + " AS bucket FROM embeddings"
    for b in range(_EMB_LSH_BANDS)
)


@register(
    "dedup_embedding_lsh",
    oracle=f"""
WITH buckets AS (
{_EMB_LSH_BUCKETS_SQL}
),
kept AS (
  SELECT band, bucket FROM buckets
  GROUP BY band, bucket HAVING COUNT(*) <= {_EMB_LSH_MAX_BUCKET}
),
bucketsf AS (
  SELECT b.* FROM buckets b JOIN kept USING (band, bucket)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bucketsf a
  JOIN bucketsf b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
pairs AS (
  SELECT vec_a, vec_b,
         {_COS_SQL.format(a="ea.embedding", b="eb.embedding")} AS cos_sim
  FROM cand
  JOIN embeddings ea ON ea.vec_id = vec_a
  JOIN embeddings eb ON eb.vec_id = vec_b
)
SELECT vec_a, vec_b, cos_sim FROM pairs WHERE cos_sim >= 0.35
""",
    doc="Embedding near-dup pairs, bucketed: banded random-hyperplane "
    "LSH discovery (8 bands × 8 planes = 256 buckets/band, equi-join "
    "on (band, bucket) — ids only, embeddings never shuffle) then "
    "exact-cosine verify on the candidate set, with a hot-bucket cap "
    "as the skew fuse (degenerate embedding regions drop from "
    "discovery, mirroring the shingle-DF cap). The 100 TB composition "
    "of the all-pairs verify stage; every join is a hash join "
    "(plan-pinned no-nested-loop).",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.lsh_near_dup_pairs(
        e, threshold=0.35,
        n_bands=_EMB_LSH_BANDS, planes_per_band=_EMB_LSH_PLANES_PER_BAND,
        max_bucket_size=_EMB_LSH_MAX_BUCKET,
    )


@register(
    "dedup_semdedup",
    oracle=f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < 16
),
assign_scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_COS_SQL.format(a="e.embedding", b="c.c_emb")} AS cos_sim
  FROM embeddings e CROSS JOIN c
  WHERE e.vec_id IS NOT NULL
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE {_COS_SQL.format(a="a.embedding", b="b.embedding")} >= 0.32
)
SELECT vec_id, centroid_id FROM assigned s
WHERE NOT EXISTS (SELECT 1 FROM dups d WHERE d.vec_id = s.vec_id)
""",
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic "
    "dedup by k-means-style clustering then WITHIN-CLUSTER pairwise "
    "cosine — the public recipe that replaced O(N^2) all-pairs "
    "embedding dedup with k*(N/k)^2 intra-cluster work on LAION/C4 "
    "corpora. Clustering = the deterministic IVF seed assignment "
    "(literal centroids, argmax inside the corpus scan); survivors = "
    "vectors with no smaller-id cluster-mate at >= 0.32 cosine (the "
    "keep-lowest-id convention). The oracle restates assignment, "
    "intra-cluster pair discovery, and the NOT-EXISTS survivor set "
    "relationally — a wrong cluster boundary, a missed pair, or a "
    "tie-break drift all hash-mismatch. At 100 TB n_centroids grows "
    "as N/target_cluster_size so the self-join stays bounded per "
    "cluster; discovery cost is the paper's headline saving.",
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.semdedup(e, n_centroids=16, threshold=0.32)


@register(
    "sim_ivf_topk_mp",
    oracle=f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < 8
),
assign_scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_COS_SQL.format(a="e.embedding", b="c.c_emb")} AS cos_sim
  FROM embeddings e CROSS JOIN c
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, centroid_id) AS rn
    FROM assign_scored WHERE vec_id IN (0, 1, 2, 3, 4)
  ) WHERE rn <= 2
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS cos_sim
  FROM assigned e JOIN q ON e.centroid_id = q.centroid_id
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cos_sim
FROM ranked WHERE rn <= 10
""",
    doc="IVF top-10 with multi-probe (2 nearest centroids per query): "
    "the recall lever at fixed bucket count — a neighbor near a "
    "Voronoi boundary lives under the query's runner-up centroid. "
    "Corpus stays single-bucketed; only the 5 broadcast query rows "
    "fan out, so cost is probes × bucket size.",
)
def sim_ivf_topk_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.ivf_topk(e, [0, 1, 2, 3, 4], k=10, n_centroids=8, probes=2)


# ---------------------------------------------------------------------------
# Deterministic sampling / train-test splitting (operators/sampling.py)
# ---------------------------------------------------------------------------



@register(
    "samp_hash_split",
    oracle=f"""
SELECT doc_id,
       CASE WHEN b < 8000 THEN 'train'
            WHEN b < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {_bucket_sql("split", "doc_id")} AS b FROM documents)
""",
    doc="Deterministic 80/10/10 train/val/test split by salted content "
    "hash of the key — membership is independent of partitioning and "
    "row order, so re-runs and backfills cannot leak held-out rows. "
    "Pure codegen'd column expression; no shuffle.",
)
def samp_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    split = sampling.hash_split(
        d, F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return split.select("doc_id", "split")


# Exact-in-binary mixture weights (0.5 + 4×0.125 sums to exactly 1.0
# as doubles), so the Spark-side normalized weights and these SQL
# literals are the same 64-bit values and floor() agrees bit-for-bit.
_MIX_WEIGHTS = {"en": 0.5, "de": 0.125, "es": 0.125, "fr": 0.125, "zh": 0.125}
_MIX_CASE = " ".join(
    f"WHEN '{k}' THEN CAST({v!r} AS DOUBLE)" for k, v in _MIX_WEIGHTS.items()
)


@register(
    "samp_domain_mixture",
    oracle=f"""
WITH counts AS (
  SELECT lang AS dom, CAST(count(*) AS DOUBLE) AS n
  FROM documents GROUP BY lang
),
wa AS (
  SELECT dom, n, w FROM (
    SELECT dom, n, CASE dom {_MIX_CASE} END AS w FROM counts
  ) WHERE w IS NOT NULL
),
rates AS (
  SELECT dom,
         CAST(floor(w * (SELECT min(n / w) FROM wa) / n * {sampling.N_BUCKETS})
              AS BIGINT) AS thr
  FROM wa
)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r ON d.lang = r.dom
WHERE {_bucket_sql("mix", "d.doc_id")} < r.thr
""",
    doc="Domain-mixture sampling: deterministically downsample to a "
    "target per-language blend (en 50%, others 12.5% each) — the "
    "largest subset achievable without upsampling (S = min n_g/w_g). "
    "Group counts aggregate map-side to one row per domain; the rate "
    "table joins back as a broadcast; the corpus itself is scanned "
    "once and filtered by a codegen'd hash predicate — never shuffled.",
)
def samp_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    # heal=False: the keep-predicate is one cheap hash per row; the
    # default documents repartition costs more than it parallelizes.
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    kept = sampling.domain_mixture(
        d, "lang", F.col("doc_id"), _MIX_WEIGHTS
    )
    return kept.select("doc_id", "lang")


@register(
    "samp_stratified",
    oracle=f"""
SELECT doc_id, lang
FROM (SELECT doc_id, lang, {_bucket_sql("strat", "doc_id")} AS b FROM documents)
WHERE b < CASE lang WHEN 'en' THEN 2500 WHEN 'zh' THEN 5000 ELSE 10000 END
""",
    doc="Deterministic stratified sampling (reproducible sampleBy): "
    "per-language keep-fractions rebalance a corpus — downsample "
    "dominant en/zh, keep the tail whole. Threshold map compiles to a "
    "codegen'd CASE; no join, no shuffle.",
)
def samp_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    kept = sampling.stratified_sample(
        d, F.col("lang"), F.col("doc_id"),
        {"en": 0.25, "zh": 0.5}, default_fraction=1.0,
    )
    return kept.select("doc_id", "lang")


@register(
    "samp_per_group_topn",
    oracle=f"""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {_bucket_sql("pergroup", "doc_id")}, CAST(doc_id AS VARCHAR)
         ) AS rn
  FROM documents
) WHERE rn <= 5
""",
    doc="Deterministic fixed-size per-group sample (reservoir-style): "
    "exactly <=5 docs per language, chosen by hash order. One hash "
    "shuffle on the group key, no global sort — the per-group top-k "
    "exchange shape at any group cardinality.",
)
def samp_per_group_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    got = sampling.per_group_sample(d, ["lang"], F.col("doc_id"), n=5)
    return got.select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Temporal joins (operators/temporal.py): as-of join, binned range join
# ---------------------------------------------------------------------------


@register(
    "tj_asof_purchase_click",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
),
r0 AS (
  SELECT user_id, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL
),
r1 AS (SELECT user_id, ts, event_id, value FROM r0 WHERE rn = 1)
SELECT l.user_id, l.ts, l.event_id, l.value,
       r1.ts AS matched_ts, r1.event_id AS matched_event_id,
       r1.value AS matched_value
FROM l ASOF LEFT JOIN r1 ON l.user_id = r1.user_id AND r1.ts <= l.ts
""",
    doc="As-of join (operator Spark lacks): each purchase gets the "
    "latest preceding click of the same user. Implemented as the "
    "union-merge window — one hash shuffle on the key, no join node, "
    "nothing to nested-loop. Oracle is DuckDB's NATIVE ASOF LEFT JOIN: "
    "an independent algorithm agreeing on the same answer.",
)
def tj_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    return temporal.asof_join(
        purchases, clicks, by=["user_id"],
        right_cols=["event_id", "value"], tie_col="event_id",
    )


@register(
    "tj_range_error_clicks",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
),
c AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id,
       count(c.ts) AS n_clicks,
       round(coalesce(sum(c.value), 0), 2) AS click_value
FROM e LEFT JOIN c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 30 MINUTE
GROUP BY e.event_id, e.user_id
""",
    doc="Range join (interval x points) without a nested loop: clicks "
    "within 30 minutes after each error, same user. Binned form — "
    "intervals explode to <=2 half-hour bins, points to 1, equi-join "
    "on (user, bin) + exact range filter — so Catalyst plans a hash "
    "join where the naive inequality join would be a "
    "BroadcastNestedLoopJoin. Oracle is DuckDB's inequality join.",
)
def tj_range_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts"), "value"
    )
    paired = temporal.range_join_binned(
        errors, clicks, by=["user_id"], start_col="ts",
        length=F.expr("INTERVAL 30 MINUTES"), point_ts="click_ts",
        bin_seconds=1800,
    )
    return (
        paired.groupBy("event_id", "user_id")
        .agg(
            F.count("click_ts").alias("n_clicks"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2)
            .alias("click_value"),
        )
        # inner pair join drops errors with zero clicks; restore them
        .join(errors.select("event_id", "user_id"), ["event_id", "user_id"],
              "right_outer")
        .fillna({"n_clicks": 0, "click_value": 0.0})
    )


# ---------------------------------------------------------------------------
# Portable sketches (operators/sketches.py): HLL distinct, histogram quantiles
# ---------------------------------------------------------------------------

_HLL_NUM = sketches.HLL_ALPHA * sketches.HLL_M * sketches.HLL_M * (
    1 << sketches.HLL_RANK_MAX
)


@register(
    "sk_hll_distinct_users",
    oracle=f"""
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
),
parts AS (
  SELECT event_type,
         CAST(floor(h / {1 << sketches.HLL_RANK_BITS}.0) AS BIGINT) AS bucket,
         h % {1 << sketches.HLL_RANK_BITS} AS w
  FROM h
),
regs AS (
  SELECT event_type, bucket,
         max(CASE WHEN w = 0 THEN {sketches.HLL_RANK_MAX}
                  ELSE {sketches.HLL_RANK_MAX} - length(bin(w)) END) AS register
  FROM parts GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         SUM(CAST(power(2, {sketches.HLL_RANK_MAX} - register) AS BIGINT))
           AS sum_occupied,
         COUNT(*) AS n_occupied
  FROM regs GROUP BY 1
),
est AS (
  SELECT event_type,
         {_HLL_NUM!r} / (sum_occupied
            + ({sketches.HLL_M} - n_occupied) * {1 << sketches.HLL_RANK_MAX}) AS raw,
         CAST({sketches.HLL_M} - n_occupied AS BIGINT) AS zeros
  FROM agg
)
SELECT event_type,
       round(CASE WHEN raw <= {2.5 * sketches.HLL_M!r} AND zeros > 0
                  THEN {float(sketches.HLL_M)!r} * ln({float(sketches.HLL_M)!r} / zeros)
                  ELSE raw END, 4) AS approx_distinct,
       zeros AS n_zero_registers
FROM est
""",
    doc="Approximate COUNT(DISTINCT) via a portable HyperLogLog "
    "(m=64): register file built relationally from the portable hash "
    "— rank is integer bit-length, the harmonic sum an exact scaled "
    "BIGINT — so unlike approx_count_distinct the estimate is "
    "bit-reproducible on any engine and the oracle hash-checks it. "
    "Per-(group,bucket) max is a map-side partial agg: the shuffle "
    "carries <=64 rows per group at any input size.",
)
def sk_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return sketches.hll_distinct(ev, ["event_type"], F.col("user_id"))


@register(
    "sk_hist_quantiles",
    oracle="""
WITH v AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi, count(value) AS n
  FROM v GROUP BY 1
),
binned AS (
  SELECT v.event_type, b.lo, b.hi, b.n,
         CASE WHEN hi = lo THEN 0 ELSE
           least(CAST(floor((value - lo) / ((hi - lo) / 100)) AS BIGINT),
                 99) END AS bin
  FROM v JOIN bounds b USING (event_type)
),
counts AS (
  SELECT event_type, lo, hi, n, bin, count(*) AS c
  FROM binned GROUP BY 1, 2, 3, 4, 5
),
cum AS (
  SELECT event_type, lo, hi, n, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cumc
  FROM counts
),
qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
SELECT event_type, q AS quantile,
       round(lo + min(bin) * (hi - lo) / 100, 4) AS value_est
FROM cum CROSS JOIN qs
WHERE cumc >= n * q
GROUP BY event_type, q, lo, hi
""",
    doc="Approximate quantiles from an equi-width histogram sketch: "
    "bounded-cardinality partial agg on (group,bin) + a window over "
    "<=100 rows per group — no global sort, unlike exact percentile, "
    "and bit-reproducible across engines (unlike percentile_approx, "
    "which no oracle can check).",
)
def sk_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return sketches.histogram_quantiles(
        ev, ["event_type"], F.col("value"), quantiles=[0.5, 0.9, 0.99]
    )


# ---------------------------------------------------------------------------
# Semi-structured (JSON) extraction
# ---------------------------------------------------------------------------


@register(
    "json_props_extract",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY event_type
""",
    doc="Semi-structured extraction: pull a typed field out of a JSON "
    "string column (events.props) and aggregate it — "
    "get_json_object stays JVM-side (no UDF), and at scale the parse "
    "happens once per row in the same codegen stage as the aggregate's "
    "map side. The schema-on-read path for log/props payloads.",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# SCD Type-2 dimension maintenance (operators/scd.py)
# ---------------------------------------------------------------------------


@register(
    "scd2_supplier_merge",
    oracle="""
WITH dim0 AS (
  SELECT s_suppkey, s_nationkey, round(s_acctbal, 2) AS acctbal,
         DATE '1995-01-01' AS effective_from
  FROM supplier
),
upd AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 3 = 0 THEN s_nationkey + 1
              ELSE s_nationkey END AS s_nationkey,
         round(s_acctbal, 2) AS acctbal
  FROM supplier WHERE s_suppkey % 3 IN (0, 1)
  UNION ALL
  SELECT s_suppkey + 1000000, s_nationkey, round(s_acctbal, 2)
  FROM supplier WHERE s_suppkey % 3 = 2
)
SELECT d.s_suppkey, d.s_nationkey, d.acctbal, d.effective_from,
       CAST(NULL AS DATE) AS effective_to, TRUE AS is_current
FROM dim0 d LEFT JOIN upd u USING (s_suppkey)
WHERE u.s_suppkey IS NULL
   OR (d.s_nationkey IS NOT DISTINCT FROM u.s_nationkey
       AND d.acctbal IS NOT DISTINCT FROM u.acctbal)
UNION ALL
SELECT d.s_suppkey, d.s_nationkey, d.acctbal, d.effective_from,
       DATE '1998-06-01', FALSE
FROM dim0 d JOIN upd u USING (s_suppkey)
WHERE d.s_nationkey IS DISTINCT FROM u.s_nationkey
   OR d.acctbal IS DISTINCT FROM u.acctbal
UNION ALL
SELECT u.s_suppkey, u.s_nationkey, u.acctbal, DATE '1998-06-01',
       CAST(NULL AS DATE), TRUE
FROM upd u LEFT JOIN dim0 d USING (s_suppkey)
WHERE d.s_suppkey IS NULL
   OR d.s_nationkey IS DISTINCT FROM u.s_nationkey
   OR d.acctbal IS DISTINCT FROM u.acctbal
""",
    doc="SCD Type-2 merge: an update snapshot against a supplier "
    "dimension — changed keys close their open row at the batch date "
    "and insert a new version, new keys insert, unchanged/absent keys "
    "survive untouched. Upgrades the reference's rebuild-from-scratch "
    "dims (Olist DW.sql:55-131) to effective-dated history. One "
    "full-outer shuffle join; history rows pass through. The change "
    "test is IS DISTINCT FROM on both sides - scd2_apply was already "
    "null-safe and the oracle's plain = silently misclassified "
    "NULL-attribute rows (null_fuzz_sweep).",
)
def scd2_supplier_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")["supplier"]
    dim0 = sup.select(
        "s_suppkey", "s_nationkey",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("1995-01-01").cast("date").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    upd = (
        sup.filter(F.col("s_suppkey") % 3 < 2)
        .select(
            "s_suppkey",
            F.when(F.col("s_suppkey") % 3 == 0, F.col("s_nationkey") + 1)
            .otherwise(F.col("s_nationkey")).alias("s_nationkey"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
        .unionByName(
            sup.filter(F.col("s_suppkey") % 3 == 2).select(
                (F.col("s_suppkey") + 1000000).alias("s_suppkey"),
                "s_nationkey",
                F.round("s_acctbal", 2).alias("acctbal"),
            )
        )
    )
    return scd.scd2_apply(
        dim0, upd,
        key_cols=["s_suppkey"], tracked_cols=["s_nationkey", "acctbal"],
        batch_ts=F.lit("1998-06-01").cast("date"),
    )


@register(
    "scd2_point_in_time",
    oracle="""
WITH dim0 AS (
  SELECT s_suppkey, s_nationkey, round(s_acctbal, 2) AS acctbal,
         DATE '1995-01-01' AS effective_from
  FROM supplier
),
upd AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 3 = 0 THEN s_nationkey + 1
              ELSE s_nationkey END AS s_nationkey,
         round(s_acctbal, 2) AS acctbal
  FROM supplier WHERE s_suppkey % 3 IN (0, 1)
  UNION ALL
  SELECT s_suppkey + 1000000, s_nationkey, round(s_acctbal, 2)
  FROM supplier WHERE s_suppkey % 3 = 2
),
dim AS (
  SELECT d.s_suppkey, d.s_nationkey, d.effective_from,
         CAST(NULL AS DATE) AS effective_to
  FROM dim0 d LEFT JOIN upd u USING (s_suppkey)
  WHERE u.s_suppkey IS NULL
     OR (d.s_nationkey IS NOT DISTINCT FROM u.s_nationkey
         AND d.acctbal IS NOT DISTINCT FROM u.acctbal)
  UNION ALL
  SELECT d.s_suppkey, d.s_nationkey, d.effective_from, DATE '1998-06-01'
  FROM dim0 d JOIN upd u USING (s_suppkey)
  WHERE d.s_nationkey IS DISTINCT FROM u.s_nationkey
     OR d.acctbal IS DISTINCT FROM u.acctbal
  UNION ALL
  SELECT u.s_suppkey, u.s_nationkey, DATE '1998-06-01',
         CAST(NULL AS DATE)
  FROM upd u LEFT JOIN dim0 d USING (s_suppkey)
  WHERE d.s_suppkey IS NULL
     OR d.s_nationkey IS DISTINCT FROM u.s_nationkey
     OR d.acctbal IS DISTINCT FROM u.acctbal
),
f AS (
  SELECT l.l_suppkey, CAST(o.o_orderdate AS DATE) AS d,
         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT CAST(EXTRACT(year FROM f.d) AS INT) AS year,
       dim.s_nationkey,
       CAST(SUM(f.cents) AS BIGINT) AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM f
JOIN dim ON dim.s_suppkey = f.l_suppkey
        AND dim.effective_from <= f.d
        AND (dim.effective_to IS NULL OR f.d < dim.effective_to)
GROUP BY 1, 2
""",
    doc="SCD Type-2 POINT-IN-TIME lookup — the query the effective-"
    "dated dimension exists for: each fact row joins the dimension "
    "VERSION that was valid on its own order date (from <= d < to), "
    "so revenue attributes to the supplier's nation AS OF the sale, "
    "not as of today — a changed supplier's pre-cutover orders keep "
    "the old nation, post-cutover orders get the new one. Plan shape: "
    "the versioned dim is dimension-sized (<= 2 rows per key) and "
    "broadcasts; the join keys on suppkey with the validity range as "
    "a residual predicate, so the fact scans once with zero shuffle "
    "before the output-bounded (year, nation) rollup. Composes the "
    "already-verified scd2_apply merge with the fact-side lookup.",
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    sup, li, o = t["supplier"], t["lineitem"], t["orders"]
    dim0 = sup.select(
        "s_suppkey", "s_nationkey",
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("1995-01-01").cast("date").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    upd = (
        sup.filter(F.col("s_suppkey") % 3 < 2)
        .select(
            "s_suppkey",
            F.when(F.col("s_suppkey") % 3 == 0, F.col("s_nationkey") + 1)
            .otherwise(F.col("s_nationkey")).alias("s_nationkey"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
        .unionByName(
            sup.filter(F.col("s_suppkey") % 3 == 2).select(
                (F.col("s_suppkey") + 1000000).alias("s_suppkey"),
                "s_nationkey",
                F.round("s_acctbal", 2).alias("acctbal"),
            )
        )
    )
    dim = scd.scd2_apply(
        dim0, upd,
        key_cols=["s_suppkey"], tracked_cols=["s_nationkey", "acctbal"],
        batch_ts=F.lit("1998-06-01").cast("date"),
    ).select("s_suppkey", "s_nationkey", "effective_from", "effective_to")
    f = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias(
            "cents"
        ),
    )
    joined = f.join(
        F.broadcast(dim),
        (F.col("s_suppkey") == F.col("l_suppkey"))
        & (F.col("effective_from") <= F.col("d"))
        & (
            F.col("effective_to").isNull()
            | (F.col("d") < F.col("effective_to"))
        ),
    )
    return joined.groupBy(
        F.year("d").alias("year"), "s_nationkey"
    ).agg(
        F.sum("cents").alias("rev_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Bloom semi-join reduction + count-min heavy hitters
# ---------------------------------------------------------------------------


@register(
    "bloom_prefilter_lineitem",
    oracle=f"""
WITH build AS (
  SELECT DISTINCT o_orderkey AS key FROM orders
  WHERE o_orderdate >= DATE '1998-01-01'
),
hashes AS (SELECT unnest([0, 1, 2]) AS i),
pos AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(i AS VARCHAR) || '|'
                              || CAST(key AS VARCHAR)), 1, 8))::BIGINT
           % {bloom.M_BITS_DEFAULT} AS p
  FROM build CROSS JOIN hashes
)
SELECT count(*) AS n_pass,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE NOT EXISTS (
  SELECT 1 FROM hashes h
  WHERE ('0x' || substr(md5(CAST(h.i AS VARCHAR) || '|'
                             || CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT
          % {bloom.M_BITS_DEFAULT}
        NOT IN (SELECT p FROM pos)
)
""",
    doc="Bloom semi-join reduction: an 8 KB bitset over 1998 order "
    "keys filters the lineitem scan map-side — no shuffle of the fact "
    "to probe the keyset; the surviving ~x% flow into the real join "
    "(false positives only, never negatives). The oracle recomputes "
    "membership from the same hash family, so the result — false "
    "positives included — matches bit-for-bit.",
)
def bloom_prefilter_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    build = t["orders"].filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("date")
    )
    words = bloom.bloom_build(build, F.col("o_orderkey"))
    li = t["lineitem"].filter(
        bloom.bloom_might_contain(F.col("l_orderkey"), words)
    )
    return li.agg(
        F.count("*").alias("n_pass"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


@register(
    "sk_cms_heavy_hitters",
    oracle=f"""
WITH cells AS (
  SELECT i.i AS r,
         ('0x' || substr(md5(CAST(i.i AS VARCHAR) || '|'
                              || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % {sketches.CMS_WIDTH} AS c
  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
),
cms AS (SELECT r, c, count(*) AS cnt FROM cells GROUP BY 1, 2),
cand AS (SELECT DISTINCT user_id FROM events),
probes AS (
  SELECT user_id AS key, i.i AS r,
         ('0x' || substr(md5(CAST(i.i AS VARCHAR) || '|'
                              || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
           % {sketches.CMS_WIDTH} AS c
  FROM cand CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
)
SELECT p.key, min(cms.cnt) AS est
FROM probes p JOIN cms ON p.r = cms.r AND p.c = cms.c
GROUP BY p.key
""",
    doc="Count-min heavy hitters: per-user event frequencies from a "
    "4x1024 counter matrix — a bounded-cardinality partial aggregate "
    "whose shuffle volume is fixed at any input size, and the sketch "
    "side always broadcastable. Integer counters: estimates are exact "
    "across engines, so even the overestimates hash-match.",
)
def sk_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    cms = sketches.cms_build(ev, F.col("user_id"))
    cand = ev.select("user_id").distinct()
    return sketches.cms_estimate(cms, cand, F.col("user_id"))


# ---------------------------------------------------------------------------
# K-means refinement (iterative algorithm, fixed-point exact)
# ---------------------------------------------------------------------------

_KM_ASSIGN_SQL = """
SELECT * FROM (
  SELECT s.*, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY sq_dist, centroid_id) AS rn
  FROM (
    SELECT q.vec_id, q.qe, c.centroid_id,
           list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, 64),
               j -> (q.qe[j] / 1000000.0 - c.c_emb[j])
                  * (q.qe[j] / 1000000.0 - c.c_emb[j]))),
             (a, x) -> a + x) AS sq_dist
    FROM q CROSS JOIN {cent} c
  ) s
) WHERE rn = 1
""".strip()


@register(
    "sim_kmeans_refine",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
  FROM embeddings
),
c0 AS (
  SELECT vec_id AS centroid_id,
         list_transform(qe, v -> v / 1000000.0) AS c_emb
  FROM q WHERE vec_id < 8
),
a1 AS ({_KM_ASSIGN_SQL.format(cent="c0")}),
sums AS (
  SELECT centroid_id, j AS d, sum(qe[j]) AS s, count(*) AS n
  FROM a1 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS j) jj
  GROUP BY 1, 2
),
c1 AS (
  SELECT centroid_id, list(s / n / 1000000.0 ORDER BY d) AS c_emb
  FROM sums GROUP BY 1
),
a2 AS ({_KM_ASSIGN_SQL.format(cent="c1")})
SELECT vec_id, centroid_id, round(sq_dist, 4) AS sq_dist FROM a2
""",
    doc="Iterative k-means (2 Lloyd rounds) refining the IVF seed "
    "centroids on FIXED-POINT vectors: quantizing to 1e-6 makes every "
    "centroid sum an exact BIGINT, so partial-aggregation order stops "
    "mattering and the iteration is bit-reproducible on any partition "
    "layout and any engine — the trick that lets an iterative ML "
    "algorithm pass a cross-engine hash gate. Per round: broadcast of "
    "C centroids + one corpus pass, then a bounded (C x dim) integer "
    "partial aggregate.",
)
def sim_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.kmeans_refine(e, n_centroids=8, iters=2)


# ---------------------------------------------------------------------------
# Skew mitigation (operators/skew.py)
# ---------------------------------------------------------------------------


@register(
    "skew_salted_join",
    oracle="""
SELECT e.user_id, u.n_events AS user_total,
       count(*) AS n, round(sum(e.value), 2) AS sum_value
FROM events e
JOIN (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1) u
  ON e.user_id = u.user_id
GROUP BY e.user_id, u.n_events
""",
    doc="Salted join for hot-key skew: the fact side's shuffle key "
    "gets a salt in [0,8), the dim side is replicated once per salt, "
    "so one hot key spreads over 8 reducers instead of serializing on "
    "one. The oracle runs the UNSALTED join — salting must be "
    "row-identical to it, which is the operator's contract.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    joined = skew.salted_join(ev, per_user, on=["user_id"], n_salts=8)
    return (
        joined.groupBy("user_id", F.col("n_events").alias("user_total"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# Window-function family (beyond per-group top-N) + CUBE + k-fold
# ---------------------------------------------------------------------------


@register(
    "w2_running_total",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events
WHERE ts IS NOT NULL
""",
    doc="Running total per user over event time (frame: unbounded "
    "preceding). Accumulated in integer cents (BIGINT): exact, so the "
    "window's summation tree shape (Spark incremental vs DuckDB "
    "segment tree) cannot drift the low bits, and — unlike the DECIMAL "
    "form this replaced — the output survives DuckDB's pandas "
    "conversion, which degrades every DECIMAL to float64 and can "
    "therefore never hash-match Spark's Decimal objects "
    "(CORRECTNESS_r02/r03: w2 had 0 divergent cells yet "
    "hash_match=false). One hash shuffle on user_id; frames never "
    "cross partitions.",
)
def w2_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull()  # timeless rows have no timeline position
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return ev.select(
        "event_id", "user_id",
        F.sum(cents).over(w).alias("running_cents"),
    )


@register(
    "w3_lag_delta",
    oracle="""
SELECT event_id, user_id,
       date_diff('second', lag(ts) OVER (
         PARTITION BY user_id ORDER BY ts, event_id), ts) AS secs_since_prev
FROM events
""",
    doc="LAG: integer seconds since the user's previous event (NULL "
    "for the first) — the sessionization primitive as a standalone "
    "window query.",
)
def w3_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return ev.select(
        "event_id", "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev))
        .cast("bigint").alias("secs_since_prev"),
    )


@register(
    "a11_cube",
    oracle="""
SELECT lang, source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
GROUP BY CUBE (lang, source)
""",
    doc="CUBE: all 2^2 grouping sets over (lang, source) in one pass "
    "(Expand + single aggregate — not 4 scans).",
)
def a11_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.cube("lang", "source").agg(
        F.count("*").alias("n"), F.sum("n_chars").alias("chars")
    )


@register(
    "samp_kfold",
    oracle=f"""
SELECT doc_id,
       CAST(({_bucket_sql("kfold", "doc_id")}) % 5 AS INT) AS fold
FROM documents
""",
    doc="K-fold cross-validation assignment (k=5) from the same "
    "salted content hash as hash_split — folds are partitioning- and "
    "run-invariant, so every training job sees the same folds.",
)
def samp_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.select(
        "doc_id",
        (sampling.hash_bucket(F.col("doc_id"), "kfold") % 5)
        .cast("int").alias("fold"),
    )


@register(
    "samp_global_fixed",
    oracle=f"""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         ('0x' || substr(md5('gfix|' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT AS h
  FROM documents
)
ORDER BY h, doc_id
LIMIT 100
""",
    doc="Global fixed-size deterministic sample: exactly k rows chosen "
    "by salted-hash order — the reservoir-sample replacement whose "
    "membership survives re-runs, backfills, and cluster resizes. "
    "Plans as TakeOrderedAndProject (per-partition top-k, then a "
    "k-row merge on one reducer): no global sort, no full shuffle, "
    "the same plan shape as the reference's TOP-N queries. Full "
    "32-bit hash + key tiebreak makes the order total, so the k-set "
    "is unique.",
)
def samp_global_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from olist_data_warehouse_spark.operators.textops import portable_hash32

    d = _t(spark, sf_dir, "documents")["documents"]
    h = portable_hash32(
        F.concat_ws("|", F.lit("gfix"), F.col("doc_id").cast("string"))
    )
    return (
        d.select("doc_id", "lang", h.alias("_h"))
        .orderBy("_h", "doc_id")
        .limit(100)
        .drop("_h")
    )


@register(
    "samp_weighted_pps",
    oracle=f"""
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
WHERE ({_bucket_sql("wpps", "doc_id")}) * 2048
      < least(CAST(length(text) AS BIGINT), 2048) * {sampling.N_BUCKETS}
""",
    doc="Probability-proportional-to-size sampling: keep probability "
    "min(len, 2048)/2048 per document from its character length — the "
    "corpus 'long documents carry more tokens' downsample, without a "
    "sort or a size histogram. Membership is a pure-integer "
    "inequality on the salted content hash (no float round/pow), so "
    "assignment is bit-identical across engines, partitionings, and "
    "row orders. Codegen'd scan filter; zero shuffle.",
)
def samp_weighted_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    kept = sampling.weighted_sample(
        d, F.col("doc_id"), F.length("text"), cap=2048, salt="wpps"
    )
    return kept.select(
        "doc_id", F.length("text").cast("long").alias("n_chars")
    )


# ---------------------------------------------------------------------------
# Final coverage: ntile, distinct union, contains-predicate pushdown
# ---------------------------------------------------------------------------


@register(
    "w4_ntile_quartiles",
    oracle="""
SELECT event_id, event_type,
       CAST(ntile(4) OVER (PARTITION BY event_type
                           ORDER BY value NULLS FIRST, event_id) AS INT)
       AS quartile
FROM events
""",
    doc="NTILE(4): equal-frequency value quartiles per event type — "
    "the bucketing used for quality-score banding in training-data "
    "curation. Deterministic via the event_id tiebreak. NULL values "
    "sort FIRST (missing = lowest band), pinned explicitly in the "
    "oracle because the engines' ASC defaults disagree (Spark nulls "
    "first, DuckDB nulls last — found by tools/null_fuzz_sweep.py).",
)
def w4_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id", "event_type",
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@register(
    "set_union_distinct",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
    doc="UNION (distinct) — completes the set-op family next to "
    "UNION ALL / INTERSECT / EXCEPT: union + one dedup shuffle.",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"].select(F.col("c_nationkey").alias("nationkey"))
        .union(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "p11_contains_filter",
    oracle="""
SELECT lang, count(*) AS n
FROM documents
WHERE text LIKE '%the%'
GROUP BY lang
""",
    doc="Substring-predicate scan: LIKE '%s%' compiles to a "
    "StringContains filter that Spark pushes into the parquet reader "
    "(row-group stats + predicate evaluation at the scan), so the "
    "filter runs before any row reaches the aggregate.",
)
def p11_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        d.filter(F.col("text").contains("the"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "multi_audio_meta",
    oracle="""
SELECT doc_id AS item_id,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE octet_length(encode(
         'FAKEAUD|16000|' || CAST(doc_id % 48000 + 8000 AS VARCHAR) || '|1|'
         || substr(text, 1, 64))) END AS INT) AS byte_len,
       text IS NOT NULL AS is_valid,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE 16000 END AS INT)
         AS sample_rate,
       CAST(CASE WHEN text IS NULL THEN 0
                 ELSE doc_id % 48000 + 8000 END AS INT) AS n_samples,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE 1 END AS INT) AS channels,
       CAST(CASE WHEN text IS NULL THEN 0
                 ELSE (doc_id % 48000 + 8000) * 1000 // 16000 END AS BIGINT)
         AS duration_ms
FROM documents
""",
    doc="Audio decode stage (completes the image/audio/video triad): "
    "fake 16 kHz payloads decoded to sample count / channel / "
    "duration metadata via the same Arrow-batched mapInPandas "
    "contract; duration is integer math so the oracle re-derives it "
    "exactly.",
)
def multi_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    n = (F.col("doc_id") % 48000 + 8000).cast("int")
    payload = F.concat(
        F.lit("FAKEAUD|16000|"), n.cast("string"), F.lit("|1|"),
        F.substring("text", 1, 64),
    ).cast("binary")
    audio = d.select(F.col("doc_id").alias("item_id"), payload.alias("payload"))
    meta = multimodal.decode_audio_meta(
        multimodal.shard_for_decode(audio)
    )
    return meta.select(
        "item_id", "byte_len", "is_valid",
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_samples").cast("int").alias("n_samples"),
        F.col("channels").cast("int").alias("channels"),
        "duration_ms",
    )


@register(
    "text_word_count",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
words AS (SELECT unnest(toks) AS word FROM tok),
counted AS (
  SELECT word, COUNT(*) AS n FROM words
  WHERE word != '' AND word NOT IN ({_STOPWORDS_SQL})
  GROUP BY word
)
SELECT word, n FROM counted ORDER BY n DESC, word LIMIT 20
""",
    doc="Corpus word-frequency top-k (explode -> filter stopwords -> "
    "count -> top-k): the canonical text-pipeline generator op. "
    "Explode happens map-side before the shuffle, so shuffle volume "
    "is (word, partial_count) pairs after partial aggregation, not "
    "the exploded token stream; top-k is TakeOrderedAndProject, no "
    "global sort. Tiebroken by word for deterministic k-boundary.",
)
def text_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # heal=False: partial aggregation collapses the exploded tokens
    # map-side, so the shuffle is tiny either way and the default
    # documents repartition is pure overhead (measured +0.2 s at sf0.1).
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    return (
        d.select(F.explode(textops.tokens("text")).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").isin(*textops.STOPWORDS))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster closure and sequence packing
# ---------------------------------------------------------------------------

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


@register(
    "dedup_cc_groups",
    oracle=f"""
WITH RECURSIVE {SQL_NORM_TOKENS},
{SQL_SHINGLES},
{SQL_MINHASH},
{_SQL_LSH_EDGES},
reach AS (
  SELECT a AS src, b AS dst FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS component_id
  FROM reach GROUP BY src
),
sizes AS (
  SELECT component_id, COUNT(*) AS n_members FROM comp GROUP BY component_id
)
SELECT c.doc_id, c.component_id, s.n_members,
       c.doc_id = c.component_id AS is_canonical
FROM comp c JOIN sizes s USING (component_id)
""",
    doc="Transitive closure of MinHash-LSH candidate pairs into "
    "duplicate clusters via hash-min label propagation "
    "(operators/components.py): if A~B and B~C then {A,B,C} is one "
    "group with one canonical survivor — the pairs->clusters step "
    "every corpus dedup needs. Per round: one (long,long) shuffle "
    "join + groupBy-min, lineage cut by localCheckpoint; rounds = "
    "graph diameter (near-dup graphs are shallow). Oracle: recursive-"
    "CTE reachability, same min-id labeling.",
)
def dedup_cc_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    edges = dedup.minhash_lsh_candidates(d, num_hashes=16, rows_per_band=4, k=3)
    return components.duplicate_clusters(edges)


@register(
    "samp_cluster_split",
    oracle=f"""
WITH RECURSIVE {SQL_NORM_TOKENS},
{SQL_SHINGLES},
{SQL_MINHASH},
{_SQL_LSH_EDGES},
reach AS (
  SELECT a AS src, b AS dst FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
comp AS (
  SELECT src AS doc_id, least(src, min(dst)) AS component_id
  FROM reach GROUP BY src
),
grouped AS (
  SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS group_id
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT doc_id, group_id,
       CASE WHEN b < 8000 THEN 'train'
            WHEN b < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT doc_id, group_id, {_bucket_sql("split", "group_id")} AS b
      FROM grouped)
""",
    doc="Leakage-safe train/val/test split: membership is decided per "
    "near-duplicate CLUSTER, not per document, so two near-dups can "
    "never straddle train and held-out (the contamination a plain "
    "per-doc hash split allows). Composition of three already-verified "
    "operators: MinHash-LSH candidate edges -> hash-min connected "
    "components -> salted-hash split keyed on the cluster id "
    "(singletons key on their own doc_id via a left join, so the "
    "fact-scale side needs only one broadcast-ready join against the "
    "small component map). Deterministic under any partitioning.",
)
def samp_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    edges = dedup.minhash_lsh_candidates(d, num_hashes=16, rows_per_band=4, k=3)
    comp = components.duplicate_clusters(edges).select(
        "doc_id", "component_id"
    )
    grouped = d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("component_id", "doc_id").alias("group_id"),
    )
    return sampling.hash_split(
        grouped, F.col("group_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "group_id", "split")


@register(
    "pack_concat_chunks",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
n AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64
           AS bucket
  FROM tok WHERE len(toks) > 0
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (
           ORDER BY bucket, doc_id ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS tok_end
  FROM n
),
s AS (
  SELECT doc_id, n_tokens, tok_end, tok_end - n_tokens AS tok_start FROM c
),
ch AS (
  SELECT doc_id, tok_start, tok_end,
         unnest(generate_series(tok_start // 2048, (tok_end - 1) // 2048))
           AS chunk_id
  FROM s
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, tok_start, tok_end,
       CAST(least(tok_end, (chunk_id + 1) * 2048)
            - greatest(tok_start, chunk_id * 2048) AS BIGINT) AS span_len
FROM ch
""",
    doc="Concat-and-chunk sequence packing: documents laid out as one "
    "token stream in canonical (hash-bucket, doc_id) order, sliced "
    "into 2048-token training windows; output is each doc's (chunk, "
    "span) coverage. The global prefix sum is the two-pass distributed "
    "form (operators/packing.py): per-bucket totals -> tiny "
    "64-row prefix -> broadcast offsets -> within-bucket window — no "
    "single-partition global sort anywhere. Oracle: one window sum "
    "ordered by (bucket, doc_id), identical layout.",
)
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return packing.concat_chunks(
        d, "doc_id", textops.token_count("text"), ctx=2048, n_buckets=64
    )


# ---------------------------------------------------------------------------
# Corpus-level text statistics
# ---------------------------------------------------------------------------

@register(
    "text_unigram_logprob",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
tks AS (
  SELECT doc_id, unnest(toks) AS token FROM tok
),
tkf AS (SELECT doc_id, token FROM tks WHERE token != ''),
freq AS (SELECT token, COUNT(*) AS cnt FROM tkf GROUP BY token),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot FROM freq),
lp AS (
  SELECT token,
         CAST(floor(-ln(CAST(cnt AS DOUBLE) / tot) * 1000000) AS BIGINT)
           AS lp_micro
  FROM freq CROSS JOIN tot
)
SELECT t.doc_id, COUNT(*) AS n_tokens,
       round(CAST(SUM(lp.lp_micro) AS BIGINT) / COUNT(*) / 1000000, 4)
         AS neg_logprob
FROM tkf t JOIN lp USING (token)
GROUP BY t.doc_id
""",
    doc="Unigram-LM quality score: average per-token -ln p(token) "
    "under the corpus's own unigram distribution — the perplexity "
    "proxy used to rank fluent vs. junk documents. Portability: the "
    "transcendental runs once per VOCABULARY entry on identical "
    "integer (cnt, total) arguments, floored to integer micro-nats; "
    "per-doc aggregation is then an exact BIGINT sum (double sums "
    "drift with partial-agg order; see operators/corpus.py).",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return corpus.unigram_logprob(d)


@register(
    "text_tfidf_topk",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
tks AS (
  SELECT doc_id, unnest(toks) AS token FROM tok
),
tkf AS (SELECT doc_id, token FROM tks WHERE token != ''),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tkf GROUP BY doc_id, token
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token AS term, tf.tf, dfreq.df,
         tf.tf * nd.n_docs / dfreq.df AS s
  FROM tf JOIN dfreq USING (token) CROSS JOIN nd
),
rn AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY s DESC, term ASC
  ) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, round(s, 4) AS score
FROM rn WHERE rn <= 3
""",
    doc="Top-3 characteristic terms per document by tf x N/df (linear "
    "inverse document frequency: one correctly-rounded IEEE division, "
    "bit-identical across engines, where log-idf's last ulp is libm-"
    "dependent — see operators/corpus.py). Frequency tables are map-"
    "side-combinable groupBys; the per-doc top-k is one window over "
    "(doc, term) rows, tiebroken by term.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return corpus.tfidf_top_terms(d, k=3)


@register(
    "pack_sliding_windows",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
n AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM tok
  WHERE len(toks) > 0
),
w AS (
  SELECT doc_id, n,
         unnest(generate_series(0, (n - 1) // 128)) AS win_idx
  FROM n
)
SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
       CAST(win_idx * 128 AS BIGINT) AS tok_start,
       CAST(least(win_idx * 128 + 256, n) AS BIGINT) AS tok_end,
       CAST(least(win_idx * 128 + 256, n) - win_idx * 128 AS BIGINT)
         AS win_len
FROM w
""",
    doc="Intra-document sliding windows (win 256, stride 128): the "
    "long-document segmentation pass for embedding contexts and "
    "extraction, complementary to pack_concat_chunks' cross-document "
    "packing. Pure per-row sequence/explode arithmetic over token "
    "counts — no shuffle, no state, scale-free (operators/packing.py).",
)
def pack_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return packing.sliding_windows(
        d, "doc_id", textops.token_count("text"), win=256, stride=128
    )


@register(
    "corpus_profile",
    oracle=r"""
WITH per AS (
  SELECT lang, source,
         CAST(len(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '
         )) AS BIGINT) AS nt,
         CAST(length(text) AS BIGINT) AS nc
  FROM documents
)
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens,
       CAST(SUM(nc) AS BIGINT) AS total_chars,
       round(CAST(SUM(nt) AS BIGINT) / COUNT(*), 4) AS avg_tokens
FROM per GROUP BY lang, source
""",
    doc="Per-(lang, source) corpus inventory — doc counts, token and "
    "char totals, token mean — the before/after report every curation "
    "stage prints. Exact integer sums (one end division for the "
    "mean), map-side combined; shuffle volume is the group "
    "cardinality, not the corpus (operators/corpus.py).",
)
def corpus_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return corpus.corpus_profile(d)


# ---------------------------------------------------------------------------
# Round 5: budget/balance sampling, kNN labeling, windowed sketches
# ---------------------------------------------------------------------------


@register(
    "samp_token_budget",
    oracle=r"""
WITH sized AS (
  SELECT doc_id, source,
         CAST(len(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '
         )) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('budget|' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 10000 AS hb,
         CAST(doc_id AS VARCHAR) AS ks
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY hb, ks
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS cum_size
  FROM sized
)
SELECT doc_id, source, n_tokens, cum_size
FROM cum WHERE cum_size <= 800
""",
    doc="Per-source token-budget selection (~800 tokens each): walk "
    "each source's docs in salted-hash order, keep while the running "
    "token total fits — corpora are blended in token units, not row "
    "counts. Deterministic on any partitioning; ONE hash shuffle on "
    "source, window state one long per group "
    "(operators/sampling.py token_budget_sample).",
)
def samp_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    sized = d.select(
        "doc_id", "source", textops.token_count("text").alias("n_tokens")
    )
    return sampling.token_budget_sample(
        sized, ["source"], F.col("doc_id"), F.col("n_tokens"),
        budget=800, salt="budget",
    ).select("doc_id", "source", "n_tokens", "cum_size")


@register(
    "samp_label_balance",
    oracle=r"""
WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
m AS (SELECT MIN(n) AS m FROM c),
r AS (
  SELECT vec_id, label,
         ROW_NUMBER() OVER (
           PARTITION BY label
           ORDER BY ('0x' || substr(md5('balance|' || CAST(vec_id AS VARCHAR)),
                                    1, 8))::BIGINT % 10000,
                    CAST(vec_id AS VARCHAR)
         ) AS rn
  FROM embeddings
)
SELECT vec_id, label FROM r, m WHERE rn <= m.m
""",
    doc="Class-rebalancing undersample: every label downsampled to the "
    "rarest label's count, membership by salted-hash order — the "
    "deterministic de-skew for labeled training sets. Class sizes are "
    "a map-side-combined aggregate (one row per class), the floor a "
    "one-row broadcast, the pick one row_number shuffle on the class "
    "key (operators/sampling.py balanced_sample).",
)
def samp_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return sampling.balanced_sample(
        e.select("vec_id", "label"), "label", F.col("vec_id"),
        salt="balance",
    ).select("vec_id", "label")


@register(
    "sim_knn_label_vote",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN (100, 101, 102, 103, 104, 105, 106, 107, 108, 109)
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
),
votes AS (
  SELECT query_id, label, COUNT(*) AS votes
  FROM ranked WHERE rn <= 5 AND label IS NOT NULL GROUP BY 1, 2
),
best AS (
  SELECT query_id, label, votes,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY votes DESC, label) AS vr
  FROM votes
)
SELECT query_id, CAST(label AS INT) AS knn_label,
       CAST(votes AS BIGINT) AS votes
FROM best WHERE vr = 1
""",
    doc="kNN classification (k=5, majority vote, ties to smallest "
    "label): the label-propagation / auto-labeling primitive — "
    "predict a tier or topic for unlabeled items from labeled "
    "neighbors. Exact top-k scorer (queries broadcast, corpus "
    "streams once) then tiny label-join + vote stages "
    "(operators/similarity.py knn_label_vote); swap the scorer for "
    "IVF/LSH when the corpus outgrows brute force.",
)
def sim_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.knn_label_vote(
        e, query_ids=list(range(100, 110)), k=5
    ).select(
        "query_id",
        F.col("knn_label").cast("int").alias("knn_label"),
        F.col("votes").cast("long").alias("votes"),
    )


@register(
    "sk_hll_daily_users",
    oracle=f"""
WITH h AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
),
parts AS (
  SELECT day,
         CAST(floor(h / {1 << sketches.HLL_RANK_BITS}.0) AS BIGINT) AS bucket,
         h % {1 << sketches.HLL_RANK_BITS} AS w
  FROM h
),
regs AS (
  SELECT day, bucket,
         max(CASE WHEN w = 0 THEN {sketches.HLL_RANK_MAX}
                  ELSE {sketches.HLL_RANK_MAX} - length(bin(w)) END) AS register
  FROM parts GROUP BY 1, 2
),
agg AS (
  SELECT day,
         SUM(CAST(power(2, {sketches.HLL_RANK_MAX} - register) AS BIGINT))
           AS sum_occupied,
         COUNT(*) AS n_occupied
  FROM regs GROUP BY 1
),
est AS (
  SELECT day,
         {_HLL_NUM!r} / (sum_occupied
            + ({sketches.HLL_M} - n_occupied) * {1 << sketches.HLL_RANK_MAX}) AS raw,
         CAST({sketches.HLL_M} - n_occupied AS BIGINT) AS zeros
  FROM agg
)
SELECT day,
       round(CASE WHEN raw <= {2.5 * sketches.HLL_M!r} AND zeros > 0
                  THEN {float(sketches.HLL_M)!r} * ln({float(sketches.HLL_M)!r} / zeros)
                  ELSE raw END, 4) AS approx_distinct,
       zeros AS n_zero_registers
FROM est
""",
    doc="Daily-active-users via the portable HyperLogLog, grouped by "
    "event day: the time-partitioned form of sk_hll_distinct_users "
    "that demonstrates what makes sketches the 100 TB answer — "
    "per-day register files are MERGEABLE partial aggregates (64 "
    "rows/day cross the shuffle however many billion events a day "
    "holds), and rolling any date range up is a max over registers, "
    "never a re-scan.",
)
def sk_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    return sketches.hll_distinct(daily, ["day"], F.col("user_id"))


@register(
    "tj_asof_forward_tol",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
),
r0 AS (
  SELECT user_id, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
),
r1 AS (SELECT user_id, ts, event_id, value FROM r0 WHERE rn = 1),
m AS (
  SELECT l.user_id, l.ts, l.event_id, l.value,
         r1.ts AS m_ts, r1.event_id AS m_eid, r1.value AS m_val
  FROM l ASOF LEFT JOIN r1 ON l.user_id = r1.user_id AND r1.ts >= l.ts
)
SELECT user_id, ts, event_id, value,
       CASE WHEN epoch_us(m_ts) - epoch_us(ts) <= 1800000000
            THEN m_ts END AS matched_ts,
       CASE WHEN epoch_us(m_ts) - epoch_us(ts) <= 1800000000
            THEN m_eid END AS matched_event_id,
       CASE WHEN epoch_us(m_ts) - epoch_us(ts) <= 1800000000
            THEN m_val END AS matched_value
FROM m
""",
    doc="FORWARD as-of join with tolerance (pandas merge_asof parity): "
    "each click gets the EARLIEST same-user purchase at/after it, "
    "nulled when it lies more than 30 minutes ahead. Same union-merge "
    "window as the backward form — direction flips which frame edge "
    "the carry reads (first-over-following), tolerance is a "
    "post-carry conditional NULL; neither adds an exchange "
    "(operators/temporal.py asof_join).",
)
def tj_asof_forward_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return temporal.asof_join(
        clicks, purchases, by=["user_id"],
        right_cols=["event_id", "value"], tie_col="event_id",
        direction="forward", tolerance_seconds=1800,
    ).select(
        "user_id", "ts", "event_id", "value",
        "matched_ts", "matched_event_id", "matched_value",
    )


@register(
    "w8_forward_fill",
    oracle="""
SELECT event_id, user_id, event_type,
       last_value(CASE WHEN event_type = 'purchase' THEN value END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS last_purchase_value
FROM events
WHERE ts IS NOT NULL
""",
    doc="Forward fill (LOCF): carry each user's most recent purchase "
    "value onto every subsequent event — the gap-fill primitive for "
    "sparse observations (sensor panels, sessionized attributes). "
    "last(col, ignorenulls) over an unbounded-preceding frame: one "
    "hash shuffle on user_id, constant per-row state, no self-join — "
    "the same carry the as-of join builds on.",
)
def w8_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull()  # timeless rows have no timeline position
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id", "user_id", "event_type",
        F.last(carried, ignorenulls=True).over(w).alias(
            "last_purchase_value"
        ),
    )


@register(
    "p12_prefix_filter",
    oracle="""
SELECT p_brand, count(*) AS n,
       CAST(sum(CAST(round(p_retailprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS retail_cents
FROM part
WHERE p_name LIKE 'a%'
GROUP BY p_brand
""",
    doc="Prefix-predicate scan: LIKE 'a%' compiles to StringStartsWith, "
    "which Spark pushes into the parquet reader where row-group min/max "
    "string stats can skip whole row groups — the third pushdown class "
    "pinned (equality/range via s1/p6, contains via p11). Plan test "
    "asserts the filter reaches PushedFilters.",
)
def p12_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    return (
        p.filter(F.col("p_name").startswith("a"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.round(F.col("p_retailprice") * 100, 0).cast("long")
            ).alias("retail_cents"),
        )
    )


@register(
    "dedup_affix_groups",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                      ' ') AS t
  FROM documents
  WHERE text IS NOT NULL
),
fp AS (
  SELECT doc_id, md5(array_to_string(t[1:8], ' ')) AS prefix_fp
  FROM tok
)
SELECT prefix_fp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
FROM fp
GROUP BY prefix_fp
HAVING COUNT(*) >= 2
""",
    doc="Affix (shared-prefix) grouping: documents whose first 8 "
    "normalized tokens are identical — the template/boilerplate-header "
    "detector (scraped pages sharing a banner, form letters, license "
    "headers) that complements whole-doc fingerprints: it catches "
    "near-copies whose tails diverge. One md5 per doc, one "
    "map-side-combined groupBy on the fingerprint — the text itself "
    "never shuffles, same shape as dedup_exact_groups.",
)
def dedup_affix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    fp = F.md5(F.concat_ws(" ", F.slice(textops.tokens("text"), 1, 8)))
    return (
        # Textless docs share no prefix with anything: excluded on both
        # sides, or concat_ws's null-skip would md5('') them into one
        # fake 49-doc "template" group (null_fuzz_sweep).
        d.filter(F.col("text").isNotNull())
        .select("doc_id", fp.alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# Shared PQ oracle scaffolding: M=4 subspaces × K=8 code words (the
# seed rows vec_id 0..7, so code index == seed vec_id), distances in
# the algebraic form ||x||² − 2·x·w + ||w||² rounded to 1e-6 before
# the argmin — mirroring operators/similarity.py pq_* exactly.
_PQ_SUB = 16
_PQ_BOOKS_SQL = f"""
subs AS (SELECT unnest([0, 1, 2, 3]) AS m),
books AS (
  SELECT e.vec_id AS code_id, s.m,
         list_transform(
           list_slice(e.embedding, s.m * {_PQ_SUB} + 1, (s.m + 1) * {_PQ_SUB}),
           x -> x::DOUBLE) AS w
  FROM embeddings e CROSS JOIN subs s
  WHERE e.vec_id < 8
),
corp AS (
  SELECT e.vec_id, s.m,
         list_transform(
           list_slice(e.embedding, s.m * {_PQ_SUB} + 1, (s.m + 1) * {_PQ_SUB}),
           x -> x::DOUBLE) AS sv
  FROM embeddings e CROSS JOIN subs s
),
coded AS (
  SELECT vec_id, m, code_id FROM (
    SELECT c.vec_id, c.m, b.code_id,
           ROW_NUMBER() OVER (
             PARTITION BY c.vec_id, c.m
             ORDER BY round(list_dot_product(c.sv, c.sv)
                            - 2 * list_dot_product(c.sv, b.w)
                            + list_dot_product(b.w, b.w), 6),
                      b.code_id) AS rn
    FROM corp c JOIN books b ON b.m = c.m
  ) WHERE rn = 1
)
""".strip()


@register(
    "sim_pq_encode",
    oracle=f"""
WITH {_PQ_BOOKS_SQL}
SELECT vec_id,
       string_agg(CAST(code_id AS VARCHAR), ',' ORDER BY m) AS pq_code
FROM coded GROUP BY vec_id
""",
    doc="Product-quantization encoding: each vector compresses to M=4 "
    "code indices (dim×4 bytes → 4 bytes, 64× — the memory lever "
    "that keeps a vector corpus RAM-resident at 100 TB; int8 scalar "
    "quantization's 4× is the gentle sibling). Codebooks are model "
    "parameters (seed subvectors, like IVF centroids / LSH planes) "
    "compiled into the scan, so encoding is a pure per-row argmin "
    "expression — zero joins, zero shuffles. Distances are "
    "||x||²−2xw+||w||² rounded to 1e-6 before the argmin with the "
    "code index as tie-break, so both engines pick identical codes; "
    "the oracle derives the same codebooks relationally from the "
    "seed rows.",
)
def sim_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.pq_encode(e, n_subspaces=4, n_codes=8)


@register(
    "sim_pq_adc_topk",
    oracle=f"""
WITH {_PQ_BOOKS_SQL},
q AS (
  SELECT e.vec_id AS query_id, s.m,
         list_transform(
           list_slice(e.embedding, s.m * {_PQ_SUB} + 1, (s.m + 1) * {_PQ_SUB}),
           x -> x::DOUBLE) AS qv
  FROM embeddings e CROSS JOIN subs s
  WHERE e.vec_id IN (0, 1, 2, 3, 4)
),
qd AS (
  SELECT q.query_id, q.m, b.code_id,
         round(list_dot_product(q.qv, q.qv)
               - 2 * list_dot_product(q.qv, b.w)
               + list_dot_product(b.w, b.w), 6) AS d
  FROM q JOIN books b ON b.m = q.m
),
adc AS (
  SELECT qd.query_id, c.vec_id AS neighbor_id,
         round(SUM(qd.d), 4) AS adc_dist
  FROM coded c
  JOIN qd ON qd.m = c.m AND qd.code_id = c.code_id
  WHERE c.vec_id != qd.query_id
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rn
  FROM adc
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, adc_dist
FROM ranked WHERE rn <= 10
""",
    doc="PQ retrieval by ASYMMETRIC distance computation: the query "
    "stays full-precision, corpus vectors are replaced by their M "
    "stored codes, and distance is Σ_m LUT_m[code] — per-(query, "
    "subspace) distances to all K code words form a lookup array "
    "riding the broadcast query rows, so scoring a corpus row is M "
    "array lookups by its code, NOT a dim-length dot. This is the "
    "property that makes PQ search memory-bandwidth-bound (codes: 4 "
    "bytes/vector) rather than FLOP-bound at 100 TB; recall recovers "
    "via a full-precision re-rank of the shortlist (the "
    "sim_quantized_topk / verify-stage pattern). Both engines "
    "compute identical rounded-1e-6 sub-distances, so the ADC sums "
    "and the k-boundary match exactly.",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.pq_adc_topk(
        e, [0, 1, 2, 3, 4], k=10, n_subspaces=4, n_codes=8
    )


@register(
    "sim_ivfpq_topk",
    oracle=f"""
WITH {_PQ_BOOKS_SQL},
c AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < 8
),
assign_scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_COS_SQL.format(a="e.embedding", b="c.c_emb")} AS acos
  FROM embeddings e CROSS JOIN c
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY acos DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
q AS (
  SELECT a.vec_id AS query_id, a.embedding AS q_emb, a.centroid_id,
         s.m,
         list_transform(
           list_slice(a.embedding, s.m * {_PQ_SUB} + 1, (s.m + 1) * {_PQ_SUB}),
           x -> x::DOUBLE) AS qv
  FROM assigned a CROSS JOIN subs s
  WHERE a.vec_id IN (0, 1, 2, 3, 4)
),
qd AS (
  SELECT q.query_id, q.m, b.code_id,
         round(list_dot_product(q.qv, q.qv)
               - 2 * list_dot_product(q.qv, b.w)
               + list_dot_product(b.w, b.w), 6) AS d
  FROM q JOIN books b ON b.m = q.m
),
qq AS (SELECT DISTINCT query_id, q_emb, centroid_id FROM q),
bucket AS (
  SELECT qq.query_id, qq.q_emb, e.vec_id AS neighbor_id, e.embedding
  FROM assigned e JOIN qq ON e.centroid_id = qq.centroid_id
  WHERE e.vec_id != qq.query_id
),
adc AS (
  SELECT bu.query_id, bu.neighbor_id, bu.q_emb, bu.embedding,
         round(SUM(qd.d), 4) AS adc_dist
  FROM bucket bu
  JOIN coded cd ON cd.vec_id = bu.neighbor_id
  JOIN qd ON qd.query_id = bu.query_id
         AND qd.m = cd.m AND qd.code_id = cd.code_id
  GROUP BY 1, 2, 3, 4
),
short AS (
  SELECT * FROM (
    SELECT query_id, neighbor_id, q_emb, embedding,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adc_dist, neighbor_id) AS srn
    FROM adc
  ) WHERE srn <= 20
),
rer AS (
  SELECT query_id, neighbor_id,
         {_COS_SQL.format(a="q_emb", b="embedding")} AS cos_sim
  FROM short
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM rer
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, cos_sim
FROM ranked WHERE rn <= 10
""",
    doc="IVF-PQ — the billion-scale retrieval pipeline as ONE composed "
    "plan: coarse-filter to the query's IVF bucket (~1/C of the "
    "corpus), ADC-scan the bucket's PQ codes (M lookup-table reads "
    "per row), then full-precision cosine re-rank of the top-20 "
    "shortlist. The corpus projection computes centroid id AND PQ "
    "codes in a single narrow scan (both literal-parameter argmin/"
    "argmax expressions, zero corpus joins before the broadcast query "
    "join). At 100 TB stages 1-2 read the bucketed layout "
    "(write_ivf_layout) with codes stored beside ids and only the "
    "re-rank touches full-precision vectors — shortlist-many id-keyed "
    "lookups per query. Every stage is an already-oracle-verified "
    "operator reused unchanged (sim_ivf_assign + sim_pq_encode + "
    "sim_pq_adc_topk + the brute-force verify).",
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.ivfpq_topk(
        e, [0, 1, 2, 3, 4], k=10, shortlist=20,
        n_centroids=8, n_subspaces=4, n_codes=8,
    )


@register(
    "sim_quantized_topk",
    oracle="""
WITH q0 AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
  FROM embeddings
),
sc AS (
  SELECT vec_id, e,
         list_aggregate(list_transform(e, x -> abs(x)), 'max') AS maxabs
  FROM q0
),
qt AS (
  SELECT vec_id,
         CASE WHEN maxabs > 0 THEN maxabs / 127.0 END AS qscale,
         CASE WHEN maxabs > 0
              THEN list_transform(
                     e, x -> round(x / (maxabs / 127.0), 0))
              ELSE list_transform(e, x -> 0.0) END AS qvec
  FROM sc
),
qq AS (
  SELECT vec_id AS query_id, qvec AS q_qvec FROM qt
  WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT qq.query_id, t.vec_id AS neighbor_id,
         CAST(list_dot_product(qq.q_qvec, t.qvec) AS BIGINT) AS qdot,
         list_dot_product(qq.q_qvec, t.qvec) * t.qscale AS mag
  FROM qt t CROSS JOIN qq
  WHERE t.vec_id != qq.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, qdot,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY mag DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank, qdot
FROM ranked WHERE rn <= 10
""",
    doc="Top-10 by int8-quantized dot product: symmetric max-abs "
    "scalar quantization (4x smaller vectors than float32), candidate "
    "scoring in exact BIGINT integer arithmetic — the cheap "
    "first-pass ranker a 100 TB vector corpus runs over its "
    "quantized-on-disk column, with float re-rank reserved for "
    "survivors (recall-vs-exact pinned in tests). Same broadcast-"
    "query one-corpus-pass shape as sim_bruteforce_topk "
    "(operators/similarity.py quantize_embeddings / quantized_topk).",
)
def sim_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.quantized_topk(e, [0, 1, 2, 3, 4], k=10)


@register(
    "samp_epoch_shard_shuffle",
    oracle="""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('epoch1|' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT AS hk
  FROM documents
)
SELECT doc_id,
       CAST(hk % 8 AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY hk % 8
                               ORDER BY hk, doc_id) AS BIGINT)
         AS pos_in_shard
FROM h
""",
    doc="Deterministic epoch shuffle-to-shards: every training epoch "
    "needs the corpus in a fresh pseudo-random order, split into "
    "reader shards — salting the content hash with the epoch number "
    "re-shuffles reproducibly (same epoch = same order on any "
    "cluster, any partitioning; no df.sample/orderBy(rand()) "
    "nondeterminism). Scale shape: shard = hash mod S is a free "
    "scan-side expression; within-shard position is a row_number over "
    "the SHARD key — one hash shuffle, never a global sort, state one "
    "counter per shard. The global-order equivalent would "
    "rangepartition the whole corpus; sharded readers don't need it.",
)
def samp_epoch_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from olist_data_warehouse_spark.operators.textops import portable_hash32

    d = _t(spark, sf_dir, "documents")["documents"]
    hk = portable_hash32(
        F.concat_ws("|", F.lit("epoch1"), F.col("doc_id").cast("string"))
    )
    shard = (hk % 8).cast("int")
    w = Window.partitionBy(shard).orderBy(hk.asc(), F.col("doc_id").asc())
    return d.select(
        "doc_id",
        shard.alias("shard"),
        F.row_number().over(w).cast("long").alias("pos_in_shard"),
    )


@register(
    "p13_above_customer_avg",
    oracle="""
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              OVER (PARTITION BY o_custkey) AS BIGINT) AS sum_cents,
         CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
  FROM orders
)
SELECT o_orderkey, o_custkey, price_cents
FROM c
WHERE price_cents * n > sum_cents
""",
    doc="The correlated-subquery pattern (orders above their own "
    "customer's average) de-correlated the way Catalyst itself would: "
    "a windowed sum/count per customer instead of a per-row rescan. "
    "The comparison is cross-multiplied integer cents "
    "(price*n > sum), so no division, no float boundary — a row "
    "exactly AT the average is excluded identically on every engine. "
    "One hash shuffle on the correlation key.",
)
def p13_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = Window.partitionBy("o_custkey")
    c = o.select(
        "o_orderkey", "o_custkey",
        cents.alias("price_cents"),
        F.sum(cents).over(w).alias("sum_cents"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return c.filter(
        F.col("price_cents") * F.col("n") > F.col("sum_cents")
    ).select("o_orderkey", "o_custkey", "price_cents")


@register(
    "decon_bloom_prefilter",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
bench AS (SELECT DISTINCT shingle FROM sh
          WHERE doc_id % 97 = 0 AND shingle IS NOT NULL),
hashes AS (SELECT unnest([0, 1, 2]) AS i),
pos AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || shingle), 1, 8))
           ::BIGINT % {bloom.M_BITS_DEFAULT} AS p
  FROM bench CROSS JOIN hashes
),
train AS (SELECT doc_id, shingle FROM sh
          WHERE doc_id % 97 <> 0 AND shingle IS NOT NULL),
tested AS (
  SELECT doc_id,
         NOT EXISTS (
           SELECT 1 FROM hashes h
           WHERE ('0x' || substr(md5(CAST(h.i AS VARCHAR) || '|'
                                     || shingle), 1, 8))::BIGINT
                   % {bloom.M_BITS_DEFAULT} NOT IN (SELECT p FROM pos)
         ) AS might
  FROM train
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN might THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_hits,
       round(sum(CASE WHEN might THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS contamination_ub
FROM tested
GROUP BY doc_id
""",
    doc="Bloom-accelerated decontamination: the bench set's shingles "
    "collapse to an 8 KB bitset (a plan literal, not a broadcast "
    "join) and every training shingle tests against it INSIDE the "
    "scan — the per-doc result is an upper bound on contamination "
    "(false positives only, never negatives), so docs with zero bloom "
    "hits skip the exact verify (decon_ngram_overlap) entirely. At "
    "100 TB this is the shape that matters: membership costs zero "
    "shuffle and the exact join runs on the tiny flagged remainder. "
    "Portable hash family -> the oracle reproduces every false "
    "positive bit-for-bit.",
)
def decon_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    # A NULL shingle (textless doc) can neither populate nor test the
    # filter — and on the SQL side a NULL bit position in the set
    # poisons every NOT IN membership test to 'unknown'. Excluded on
    # both sides (null_fuzz_sweep).
    bench_sh = (
        dedup.shingle_sets(bench, 3)
        .filter(F.col("shingle").isNotNull())
        .select("shingle")
        .distinct()
    )
    words = bloom.bloom_build(bench_sh, F.col("shingle"))
    train_sh = dedup.shingle_sets(train, 3).filter(
        F.col("shingle").isNotNull()
    )
    hit = F.when(
        bloom.bloom_might_contain(F.col("shingle"), words), 1
    ).otherwise(0)
    return (
        train_sh.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(hit).alias("n_bloom_hits"),
        )
        .withColumn(
            "contamination_ub",
            F.round(
                F.col("n_bloom_hits") / F.col("n_shingles").cast("double"), 4
            ),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 continuation: IVM agg merge, reconciliation audit, span dedup,
# bigram heavy hitters, window completeness
# ---------------------------------------------------------------------------


@register(
    "ivm_agg_merge",
    oracle="""
SELECT o_custkey,
       CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m') AS INT) AS month_key,
       CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1, 2
""",
    doc="Incremental view maintenance for distributive aggregates: the "
    "monthly revenue rollup is maintained as partial aggregates — a "
    "BASE agg over history plus a DELTA agg over the new batch, "
    "merged by summing partials (SUM and COUNT are associative and "
    "commutative, so merge(agg(A), agg(B)) == agg(A union B) exactly "
    "in integer cents). The oracle computes the full rollup in one "
    "pass and must match bit-for-bit. At 100 TB this is THE refresh "
    "shape: the nightly job scans only the delta (days, not years), "
    "merges into the materialized rollup with dynamic partition "
    "overwrite on the touched months, and never rereads the fact. "
    "Algebraic aggregates (avg) derive from (sum, count); holistic "
    "ones (exact median) do not merge — those recompute or use "
    "mergeable sketches (sk_hist_quantiles). The base/delta split "
    "routes NULL dates explicitly (they satisfy neither inequality "
    "— an unrouted null row is silently LOST by the merge while the "
    "one-pass oracle keeps it; null_fuzz_sweep).",
)
def ivm_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    cut = F.lit("1996-01-01").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "o_custkey",
            F.date_format("o_orderdate", "yyyyMM").cast("int").alias(
                "month_key"
            ),
        ).agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("rev_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )

    # The split must PARTITION the fact: a NULL order date satisfies
    # neither inequality, so without the isNull() route those rows
    # silently vanish from the merged view while a one-pass rollup
    # keeps their NULL-month group (null_fuzz_sweep's catch — the
    # classic incremental-pipeline drop).
    base = partial(
        o.filter(
            (F.col("o_orderdate") < cut) | F.col("o_orderdate").isNull()
        )
    )
    delta = partial(o.filter(F.col("o_orderdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("o_custkey", "month_key")
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.sum("n_orders").alias("n_orders"),
        )
    )


@register(
    "j9_reconcile_orders_lines",
    oracle="""
WITH a AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
  FROM orders
),
b AS (
  SELECT l_orderkey,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS line_cents
  FROM lineitem GROUP BY 1
)
SELECT
  CAST(count(*) FILTER (WHERE a.o_orderkey IS NOT NULL
                          AND b.l_orderkey IS NOT NULL) AS BIGINT)
    AS matched,
  CAST(count(*) FILTER (WHERE b.l_orderkey IS NULL) AS BIGINT)
    AS orders_without_lines,
  CAST(count(*) FILTER (WHERE a.o_orderkey IS NULL) AS BIGINT)
    AS orphan_line_orders,
  CAST(COALESCE(SUM(b.n_lines), 0) AS BIGINT) AS total_lines,
  CAST(count(*) FILTER (WHERE a.price_cents = b.line_cents) AS BIGINT)
    AS price_exact_matches
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.l_orderkey
""",
    doc="Cross-table reconciliation audit — the data-quality gate every "
    "warehouse load runs after ingest (the reference's SSIS package "
    "implies it between its OLTP extract and DW load): orders vs the "
    "per-order rollup of lineitem, FULL OUTER JOIN on the key, "
    "classifying matched / header-without-lines / orphan-lines and "
    "counting exact integer-cents price agreement. Scale shape: each "
    "side map-side-combines to order grain first (lineitem collapses "
    "~4:1 before the join), one shuffle on o_orderkey, then the "
    "classification folds to a single row with a map-side-combined "
    "global aggregate — output size is O(1) regardless of input size.",
)
def j9_reconcile_orders_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "orders", "lineitem")
    a = t["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("price_cents"),
    )
    b = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("line_cents"),
        )
    )
    j = a.join(b, a.o_orderkey == b.l_orderkey, "full_outer")
    both = F.col("o_orderkey").isNotNull() & F.col("l_orderkey").isNotNull()
    return j.agg(
        F.count(F.when(both, 1)).alias("matched"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias(
            "orders_without_lines"
        ),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias(
            "orphan_line_orders"
        ),
        F.coalesce(F.sum("n_lines"), F.lit(0)).alias("total_lines"),
        F.count(
            F.when(F.col("price_cents") == F.col("line_cents"), 1)
        ).alias("price_exact_matches"),
    )


SPAN_W = 8  # words per span chunk


@register(
    "dedup_span_chunks",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
ch AS (
  SELECT doc_id,
         generate_subscripts(chs, 1) - 1 AS idx,
         unnest(chs) AS chunk
  FROM (
    SELECT doc_id,
           list_transform(
             range(0, len(toks) // {SPAN_W}),
             i -> array_to_string(
                    toks[i * {SPAN_W} + 1 : i * {SPAN_W} + {SPAN_W}], ' ')
           ) AS chs
    FROM tok WHERE len(toks) >= {SPAN_W}
  )
),
occ AS (
  SELECT doc_id, md5(chunk) AS h, doc_id * 100000 + idx AS k
  FROM ch
),
mins AS (SELECT h, MIN(k) AS mk FROM occ GROUP BY h)
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN o.k = m.mk THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       round(sum(CASE WHEN o.k = m.mk THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS retained_ratio
FROM occ o JOIN mins m ON o.h = m.h
GROUP BY 1
""",
    doc="Paragraph-granularity exact dedup (the Dolma / RefinedWeb "
    "'dedupe paragraphs, keep documents' pass), adapted to the "
    "synthetic corpus's newline-free text as fixed 8-word spans: "
    "every non-overlapping span is kept only at its globally first "
    "occurrence (min doc_id, then min position — an integer-packed "
    "key so the tie-break is one MIN, not a struct ordering), and "
    "each document reports how much of it survives. Scale shape: "
    "spans are md5'd IMMEDIATELY so the shuffle moves 32-hex keys, "
    "never text; first-occurrence is a map-side-combined MIN per hash "
    "joined back on h (NOT a window over h: a boilerplate span "
    "repeated corpus-wide makes h a hot key, and AQE can split a "
    "skewed join but not a window partition), and the per-doc rollup "
    "partially aggregates map-side. 128-bit keys make collisions "
    "negligible at any corpus size (~1e-18 at 10^12 spans).",
)
def dedup_span_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")["documents"]
    W = SPAN_W
    toks = d.select(
        "doc_id", textops.tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= W)
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0), (F.size("toks") / W).cast("int") - 1
                ),
                lambda i: F.array_join(
                    F.slice(F.col("toks"), i * W + 1, W), " "
                ),
            )
        ).alias("idx", "chunk"),
    )
    occ = chunks.select(
        "doc_id",
        F.md5("chunk").alias("h"),
        (F.col("doc_id") * 100000 + F.col("idx")).alias("k"),
    )
    # First-occurrence via groupBy+join rather than a window MIN over
    # the hash: same shuffle volume (both hash-partition on h), but a
    # boilerplate span repeated across the whole corpus makes h a hot
    # key — AQE can split a skewed JOIN, while a skewed window
    # partition is one indivisible task. The map-side partial MIN also
    # collapses the hot key before it ever crosses the wire.
    mins = occ.groupBy("h").agg(F.min("k").alias("mk"))
    kept = F.when(F.col("k") == F.col("mk"), 1).otherwise(0)
    return (
        occ.join(mins, "h")
        .withColumn("kept", kept)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("kept").alias("n_kept"),
        )
        .withColumn(
            "retained_ratio",
            F.round(F.col("n_kept") / F.col("n_chunks").cast("double"), 4),
        )
    )


@register(
    "text_bigram_topk",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
bi AS (
  SELECT unnest(list_transform(
           range(1, len(toks)),
           i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM tok WHERE len(toks) >= 2
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM bi GROUP BY 1
ORDER BY n DESC, bigram
LIMIT 20
""",
    doc="Corpus-level bigram heavy hitters — the exact-count companion "
    "to sk_cms_heavy_hitters and the building block for boilerplate "
    "and template detection (a bigram appearing in millions of "
    "documents is navigation chrome, not language). Bigrams are "
    "formed JVM-side with zip_with over two shifted slices (no "
    "Python, no self-join), counted with one map-side-combined "
    "shuffle on the bigram, and the top-k is TakeOrderedAndProject "
    "(count DESC, bigram ASC — the T4 tie convention), so only 20 "
    "rows ever reach the driver. At 100 TB the exact count is one "
    "shuffle of partial counts (vocabulary-bounded, not corpus-"
    "bounded); if even that is too wide, the CMS sketch twin "
    "estimates the same list in O(1) memory.",
)
def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    t = d.select(textops.tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 2
    )
    n1 = F.size("toks") - 1
    bi = t.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, n1),
                F.slice(F.col("toks"), 2, n1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram")
    )
    return (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "w9_cume_dist_nth",
    oracle="""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
  FROM customer
)
SELECT c_custkey, c_nationkey, bal_cents,
       round(cume_dist() OVER w, 4) AS cume_frac,
       nth_value(c_custkey, 2) OVER (
         PARTITION BY c_nationkey
         ORDER BY bal_cents NULLS FIRST, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS second_lowest_key
FROM c
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY bal_cents NULLS FIRST, c_custkey)
""",
    doc="Window-function completeness: cume_dist and nth_value over the "
    "per-nation balance ordering. The ORDER BY is made unique with "
    "the key tie-break, so cume_dist degenerates to rank/n — an "
    "exact small-integer division that rounds identically on both "
    "engines — and nth_value(2) (explicit full-frame, since the "
    "default frame would return NULL for the partition's first row) "
    "is deterministic (NULL balances sort FIRST, pinned in the oracle). One hash exchange on c_nationkey + an "
    "in-partition sort; no global sort. Single-customer nations "
    "yield NULL second_lowest_key on both engines.",
)
def w9_cume_dist_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = _t(spark, sf_dir, "customer")["customer"]
    base = c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    wb = Window.partitionBy("c_nationkey").orderBy("bal_cents", "c_custkey")
    wf = wb.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return base.select(
        "c_custkey",
        "c_nationkey",
        "bal_cents",
        F.round(F.cume_dist().over(wb), 4).alias("cume_frac"),
        F.nth_value("c_custkey", 2).over(wf).alias("second_lowest_key"),
    )


@register(
    "p14_exists_semi",
    oracle="""
SELECT c_custkey, c_name, c_nationkey
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND CAST(round(o.o_totalprice * 100, 0) AS BIGINT) > 45000000
)
""",
    doc="Positive EXISTS — the semi-join complement of the NOT IN "
    "anti-join pair (p5/j8): customers with at least one order above "
    "450k, planned as LEFT SEMI so each customer row emits at most "
    "once no matter how many orders qualify (an INNER join + "
    "DISTINCT would shuffle the fan-out first and dedup after — the "
    "semi join never materializes the multiplicity). The price "
    "filter pushes below the join, so the build side carries only "
    "qualifying orders; integer-cents comparison keeps the boundary "
    "row identical on both engines.",
)
def p14_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(
        F.round(F.col("o_totalprice") * 100, 0).cast("long") > 45000000
    )
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_nationkey")
    )


# Packed argmax key: n_tokens * 1e7 - doc_id (doc_id in [0, 1e7)), so
# one integer MAX picks (max n_tokens, tie -> min doc_id) and both
# fields decode back exactly: nt = (packed + 9999999) // 1e7,
# id = nt * 1e7 - packed.
_KEEP_BEST_PACK = 10_000_000


@register(
    "dedup_keep_best",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS t
  FROM documents
),
corpus AS (
  SELECT doc_id, t FROM base
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         t[1 : greatest(8, len(t) // 2)] AS t
  FROM base WHERE doc_id < 50
),
fp AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_tokens,
         md5(array_to_string(t[1:8], ' ')) AS prefix_fp
  FROM corpus WHERE len(t) >= 8
),
grp AS (
  SELECT prefix_fp,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         MAX(n_tokens * {_KEEP_BEST_PACK} + ({_KEEP_BEST_PACK} - 1)
             - doc_id) AS packed
  FROM fp GROUP BY prefix_fp HAVING COUNT(*) >= 2
)
SELECT prefix_fp, n_docs,
       CAST((packed + {_KEEP_BEST_PACK} - 1) // {_KEEP_BEST_PACK}
            AS BIGINT) AS kept_n_tokens,
       CAST((packed + {_KEEP_BEST_PACK} - 1) // {_KEEP_BEST_PACK}
            * {_KEEP_BEST_PACK} + ({_KEEP_BEST_PACK} - 1) - packed
            AS BIGINT) AS kept_doc_id
FROM grp
""",
    doc="Quality-aware dedup: within a duplicate group keep the BEST "
    "exemplar, not the first seen — the curation policy real corpora "
    "use (among a page and its truncated syndicated copies, keep the "
    "longest). Near-copies are synthesized by re-adding the first 50 "
    "docs truncated to half length (same 8-token prefix -> same "
    "group, fewer tokens -> loses). The argmax is a PACKED INTEGER "
    "MAX — n_tokens*1e7 + (1e7-1-doc_id), so one plain aggregate "
    "yields (max tokens, tie -> min doc_id) and both fields decode "
    "exactly — which map-side combines like any MAX; no window, no "
    "sort, no join, and the md5 group key means text never shuffles. "
    "Contrast w1_window_topn_per_group: a windowed row_number needs "
    "a per-group sort; the packed MAX is the shape that survives a "
    "billion groups.",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    P = _KEEP_BEST_PACK
    base = d.select("doc_id", textops.tokens(F.col("text")).alias("t"))
    trunc = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.slice(
            F.col("t"), 1, F.greatest(F.lit(8), F.expr("size(t) div 2"))
        ).alias("t"),
    )
    corpus = base.unionByName(trunc).filter(F.size("t") >= 8)
    fp = corpus.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.slice(F.col("t"), 1, 8))).alias(
            "prefix_fp"
        ),
    )
    packed_col = (
        F.col("n_tokens") * P + F.lit(P - 1) - F.col("doc_id")
    )
    grp = (
        fp.groupBy("prefix_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(packed_col).alias("packed"),
        )
        .filter(F.col("n_docs") >= 2)
    )
    kept_nt = F.expr(f"(packed + {P - 1}) div {P}")
    return grp.select(
        "prefix_fp",
        "n_docs",
        kept_nt.alias("kept_n_tokens"),
        (kept_nt * P + F.lit(P - 1) - F.col("packed")).alias("kept_doc_id"),
    )


@register(
    "sim_centroid_outlier",
    oracle=f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < 8
),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         {_COS_SQL.format(a="e.embedding", b="c.c_emb")} AS cos_sim
  FROM embeddings e CROSS JOIN c
),
ranked AS (
  SELECT vec_id, centroid_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cos_sim DESC, centroid_id) AS rn
  FROM scored
)
SELECT vec_id, centroid_id, cos_sim
FROM ranked WHERE rn = 1 AND cos_sim < 0.05
""",
    doc="Embedding-space outlier pruning (the SemDeDup-style curation "
    "complement of dedup: drop points that sit far from EVERY "
    "cluster center — noise, encoding failures, off-distribution "
    "junk): vectors whose best-centroid cosine falls below 0.05 "
    "(~the 4th percentile here). Same zero-join scan shape as "
    "sim_ivf_assign — centroids are plan-time literals, the argmax "
    "and the threshold test both run inside the scan projection, so "
    "the filter is shuffle-FREE at any corpus size (unlike per-"
    "cluster bottom-k, which would need a C-partition window sort). "
    "The 4dp round happens before the compare, so the boundary row "
    "is identical on both engines.",
)
def sim_centroid_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    assigned = similarity.ivf_assign(e, n_centroids=8)
    return assigned.filter(F.col("cos_sim") < 0.05).select(
        "vec_id", "centroid_id", "cos_sim"
    )


# ---------------------------------------------------------------------------
# Product-analytics family over the events stream: date-spine gap fill,
# sequential funnel, cohort retention, typed histogram serialization
# ---------------------------------------------------------------------------


@register(
    "ts_gapfill_daily",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
b AS (SELECT user_id, min(d) AS f, max(d) AS l FROM daily GROUP BY 1),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(f, l, INTERVAL 1 DAY)) AS DATE) AS d
  FROM b
)
SELECT s.user_id, strftime(s.d, '%Y-%m-%d') AS day,
       COALESCE(dd.n, 0) AS n_events
FROM spine s LEFT JOIN daily dd ON s.user_id = dd.user_id AND s.d = dd.d
""",
    doc="Time-series gap filling with a generated date spine: every "
    "user gets a dense row per calendar day of their own active span, "
    "zero-filled where no events landed — the shape every retention/"
    "forecasting job needs before window math (a LAG over sparse days "
    "silently skips the gaps). The spine is sequence()-generated from "
    "per-user (min, max) bounds — rows are MANUFACTURED by the plan, "
    "not read — then equi-left-joined back to the daily counts. Scale "
    "shape: daily counts map-side combine; the spine is output-"
    "bounded (sum of active spans, the size the report needs anyway); "
    "the join is on (user, day) so AQE handles it like any fact join. "
    "Day keys are strings on both engines (the events-table oracle "
    "convention), so no DATE-encoding hash drift.",
)
def ts_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.groupBy("user_id").agg(
        F.min("d").alias("f"), F.max("d").alias("l")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(f, l, interval 1 day)")).alias("d"),
    )
    return (
        spine.join(daily, ["user_id", "d"], "left")
        .select(
            "user_id",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@register(
    "funnel_steps",
    oracle="""
WITH s1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t1
  FROM events
),
s2 AS (
  SELECT user_id, ts, event_type, t1,
         min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
           OVER (PARTITION BY user_id) AS t2
  FROM s1
),
s3 AS (
  SELECT user_id, t1, t2,
         min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
           OVER (PARTITION BY user_id) AS t3
  FROM s2
),
per_user AS (
  SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
  FROM s3 GROUP BY 1
)
SELECT
  CAST(count(*) AS BIGINT) AS n_users,
  CAST(count(t1) AS BIGINT) AS n_step_view,
  CAST(count(t2) AS BIGINT) AS n_step_click,
  CAST(count(t3) AS BIGINT) AS n_step_purchase
FROM per_user
""",
    doc="Strictly-ordered funnel (view -> later click -> later "
    "purchase): each step's timestamp is the earliest qualifying "
    "event AFTER the previous step, so out-of-order activity never "
    "counts — the sequential semantics product funnels actually mean, "
    "not three independent EXISTS. The chained conditional mins are "
    "three stacked window aggregates over the SAME partition spec, "
    "which Catalyst plans as one exchange on user_id with zero extra "
    "shuffles (pinned); the funnel report then folds to a single row "
    "map-side. At 100 TB: one hash shuffle of the events, state per "
    "user is three timestamps, and the same chain extends to any "
    "step count without new exchanges.",
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = e.select("user_id", "ts", "event_type", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    s2 = s1.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    s3 = s2.withColumn("t3", t3)
    per_user = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_step_view"),
        F.count("t2").alias("n_step_click"),
        F.count("t3").alias("n_step_purchase"),
    )


@register(
    "cohort_retention",
    oracle="""
WITH f AS (
  SELECT user_id, ts,
         min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS first_day
  FROM events
)
SELECT strftime(first_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', first_day, CAST(ts AS DATE)) // 7 AS BIGINT)
         AS offset_weeks,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
FROM f
GROUP BY 1, 2
""",
    doc="Cohort retention: users grouped by first-seen day, activity "
    "bucketed into integer week offsets from THAT user's own start "
    "(pure day arithmetic — no week-of-year convention, so both "
    "engines bucket identically), counting distinct active users per "
    "(cohort, offset) cell. Two exchanges: the first-touch window on "
    "user_id, then the distinct-count aggregate — a single DISTINCT "
    "column plans as the two-phase partial-dedup (no Expand node, "
    "pinned), so the second shuffle carries (cohort, offset, user) "
    "triples already deduped map-side. The cohort matrix is output-"
    "bounded (days x weeks), tiny at any input scale.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id")
    f = e.select(
        "user_id",
        "ts",
        F.min(F.to_date("ts")).over(w).alias("first_day"),
    )
    return (
        f.select(
            F.date_format("first_day", "yyyy-MM-dd").alias("cohort_day"),
            F.floor(
                F.datediff(F.to_date("ts"), F.col("first_day")) / 7
            ).alias("offset_weeks"),
            "user_id",
        )
        .groupBy("cohort_day", "offset_weeks")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


@register(
    "a18_event_histogram",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       array_to_string(
         list_sort(list(coalesce(event_type, '') || ':'
                        || CAST(n AS VARCHAR))),
         ',') AS histogram,
       CAST(sum(n) AS BIGINT) AS n_events
FROM c GROUP BY user_id
""",
    doc="Nested-type aggregation with a canonical serialization: each "
    "user's per-event-type counts collapse to ONE deterministic "
    "'type:count,...' string — collect_list order is partition-"
    "dependent, so the sort_array BEFORE serializing is what makes "
    "the result identical on any engine, any layout (the same "
    "binary-UTF8 ordering the T4 tie convention relies on). This is "
    "the portable form of a map<string,long> column: feature dicts, "
    "label histograms, per-doc tag bags all serialize this way when "
    "engines must agree bit-for-bit. Two map-side-combined exchanges "
    "(type grain, then user grain); the array never exceeds the "
    "event-type vocabulary.",
)
def a18_event_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    # concat_ws SKIPS null parts (an unlabeled type would serialize
    # as a bare count) while SQL || nulls the whole entry — pin the
    # canonical form for a NULL type to ':n' via coalesce('') on both
    # sides (null_fuzz_sweep).
    entry = F.concat_ws(
        ":", F.coalesce(F.col("event_type"), F.lit("")), F.col("n")
    )
    return c.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_list(entry)), ","
        ).alias("histogram"),
        F.sum("n").alias("n_events"),
    )


@register(
    "reco_item_cooccurrence",
    oracle="""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract(props, '$.k') IS NOT NULL
),
co AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item != b.item
  GROUP BY 1, 2
),
ranked AS (
  SELECT item_a, item_b, n_users,
         ROW_NUMBER() OVER (PARTITION BY item_a
                            ORDER BY n_users DESC, item_b) AS rn
  FROM co
)
SELECT item_a, item_b, CAST(rn AS INT) AS rank, n_users
FROM ranked WHERE rn <= 5
""",
    doc="Item-to-item co-occurrence recommender ('users who engaged "
    "with A also engaged with B'): distinct (user, item) pairs -> "
    "self-join on user -> per-pair user counts -> top-5 co-items per "
    "item. The (user, item) dedup happens BEFORE the self-join (one "
    "map-side-combined exchange), so the join fan-out per user is "
    "C(distinct items, 2), never C(raw events, 2) — at 100 TB the "
    "documented skew knob is capping per-user distinct items (top-N "
    "by recency) before the join, exactly the bound production "
    "co-occurrence jobs apply; the output is vocabulary-bounded "
    "(items x 5) regardless of input scale. Ties break to the "
    "smaller item id, both engines.",
)
def reco_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    ui = (
        e.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("item_a") != F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("item_a").orderBy(
        F.desc("n_users"), F.asc("item_b")
    )
    return (
        co.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("item_a", "item_b", "rank", "n_users")
    )


@register(
    "reco_item_lift",
    oracle="""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract(props, '$.k') IS NOT NULL
),
n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ui),
supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM ui GROUP BY 1),
co AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS s_ab
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2
)
SELECT co.item_a, co.item_b, co.s_ab,
       (1000000 * co.s_ab * n.n_users) // (sa.s * sb.s) AS lift_ppm
FROM co
JOIN supp sa ON sa.item = co.item_a
JOIN supp sb ON sb.item = co.item_b
CROSS JOIN n
WHERE (1000000 * co.s_ab * n.n_users) // (sa.s * sb.s) > 1000000
""",
    doc="Association-rule LIFT over item pairs: lift(A,B) = "
    "P(A∧B)/(P(A)P(B)) in integer ppm — N·s_ab·1e6 // (s_a·s_b), "
    "pure BIGINT so the >1 threshold (genuinely associated pairs, "
    "not popularity artifacts) cuts identically on both engines. "
    "Same dedup-before-self-join discovery as the co-occurrence "
    "recommender; per-item supports join back as a (vocabulary-"
    "sized) broadcast and the total-users denominator is a one-row "
    "cross join. Output bounded by the item-pair vocabulary.",
)
def reco_item_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    ui = (
        e.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    n = ui.agg(F.countDistinct("user_id").alias("n_users"))
    supp = ui.groupBy("item").agg(F.count(F.lit(1)).alias("s"))
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("s_ab"))
    )
    sa = supp.select(F.col("item").alias("item_a"), F.col("s").alias("sa"))
    sb = supp.select(F.col("item").alias("item_b"), F.col("s").alias("sb"))
    lift = F.expr("(1000000 * s_ab * n_users) div (sa * sb)")
    return (
        co.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n))
        .select("item_a", "item_b", "s_ab", lift.alias("lift_ppm"))
        .filter(F.col("lift_ppm") > 1000000)
    )


# Benford first-digit expectation log10(1 + 1/d), floored to ppm —
# nine plan literals, bit-identical on both engines by construction.
_BENFORD_PPM = {
    d: int(__import__("math").log10(1 + 1 / d) * 1_000_000)
    for d in range(1, 10)
}
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()
)


@register(
    "dq_benford_digits",
    oracle=f"""
WITH v AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM v)
SELECT v.digit,
       CAST(COUNT(*) AS BIGINT) AS observed,
       (1000000 * COUNT(*)) // n.total AS observed_ppm,
       CASE v.digit {_BENFORD_CASE} END AS expected_ppm,
       ABS((1000000 * COUNT(*)) // n.total
           - CASE v.digit {_BENFORD_CASE} END) AS abs_dev_ppm
FROM v CROSS JOIN n
GROUP BY v.digit, n.total
""",
    doc="Benford's-law first-digit audit — the screening test fraud "
    "and data-quality reviews run on money columns: observed "
    "first-digit frequencies vs the log10(1+1/d) expectation, both "
    "in integer ppm (the expectations are nine plan literals computed "
    "once; observed shares are BIGINT floor-division), so deviations "
    "are engine-exact. One scan + one 9-row aggregate; the total-row "
    "denominator is a one-row broadcast. TPC-H prices are synthetic "
    "uniforms, so the large deviations HERE are the point — the audit "
    "flags exactly this kind of generated data.",
)
def dq_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    v = o.filter(F.col("o_totalprice") > 0).select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast(
                "string"
            ),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    n = v.agg(F.count(F.lit(1)).alias("total"))
    expected = F.element_at(
        F.create_map(
            *[
                F.lit(x)
                for pair in _BENFORD_PPM.items()
                for x in pair
            ]
        ),
        F.col("digit"),
    ).cast("long")
    return (
        v.crossJoin(F.broadcast(n))
        .groupBy("digit", "total")
        .agg(F.count(F.lit(1)).alias("observed"))
        .select(
            "digit",
            "observed",
            F.expr("(1000000 * observed) div total").alias("observed_ppm"),
            expected.alias("expected_ppm"),
            F.abs(
                F.expr("(1000000 * observed) div total") - expected
            ).alias("abs_dev_ppm"),
        )
    )


# Directed item graph for the PageRank demo: each item's top-3
# co-occurring items (by shared-user count, ties to smaller id) — the
# same edges a production "related items" job materializes.
_PR_EDGES_SQL = """
ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract(props, '$.k') IS NOT NULL
),
co AS (
  SELECT a.item AS src, b.item AS dst,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item != b.item
  GROUP BY 1, 2
),
edges AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY n_users DESC, dst) AS rn
    FROM co
  ) WHERE rn <= 3
),
nodes AS (SELECT DISTINCT src AS item FROM edges
          UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
        FROM edges GROUP BY src)
""".strip()

# One damped power-iteration step in integer micro-units: per-edge
# contribution floor((0.85 * rank_src) / outdeg_src), then the 0.15
# base. Repeated verbatim per unrolled oracle iteration.
def _pr_step_sql(cur: str, nxt: str) -> str:
    return f"""
{nxt} AS (
  SELECT n.item,
         150000 + COALESCE(CAST(SUM(
           (850000 * r.rank_micro) // (1000000 * d.outdeg)
         ) AS BIGINT), 0) AS rank_micro
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.item
  LEFT JOIN {cur} r ON r.item = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.item
)""".strip()


@register(
    "graph_pagerank_items",
    oracle=f"""
WITH {_PR_EDGES_SQL},
r0 AS (SELECT item, CAST(1000000 AS BIGINT) AS rank_micro FROM nodes),
{_pr_step_sql("r0", "r1")},
{_pr_step_sql("r1", "r2")},
{_pr_step_sql("r2", "r3")}
SELECT item, rank_micro FROM r3
""",
    doc="INTEGER-EXACT PageRank (damping 0.85, 3 fixed power "
    "iterations) over the directed item graph built from each item's "
    "top-3 co-occurring items — the iterative-algorithm family beyond "
    "connected components and k-means. All rank mass moves in micro "
    "units with per-edge floor division, so every iteration is pure "
    "BIGINT arithmetic and the oracle's unrolled-CTE iterations match "
    "bit-for-bit (the float form would drift across engines by "
    "summation order). Per iteration: one equi-join of the compact "
    "(src, dst, outdeg) edge list against the (node, rank) table plus "
    "one groupBy-sum, both map-side combined — the identical shuffle "
    "shape as hash-min CC, cost O(|edges|) per round, the graph's "
    "text/payload never moves. Fixed iteration count keeps the entry "
    "oracle-expressible; production convergence loops add the "
    "localCheckpoint lineage cut the CC operator demonstrates.",
)
def graph_pagerank_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    ui = (
        e.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    a = ui.select("user_id", F.col("item").alias("src"))
    b = ui.select("user_id", F.col("item").alias("dst"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("n_users"), F.asc("dst"))
    edges = (
        co.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("src", "dst")
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("item"))
        .union(edges.select(F.col("dst").alias("item")))
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, "src").persist()
    ranks = nodes.select(
        "item", F.lit(1000000).cast("long").alias("rank_micro")
    )
    for _ in range(3):
        contrib = (
            ed.join(ranks, ed.src == ranks.item)
            .select(
                F.col("dst").alias("item"),
                F.expr(
                    "(850000 * rank_micro) div (1000000 * outdeg)"
                ).alias("c"),
            )
            .groupBy("item")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "item", "left").select(
            "item",
            (F.lit(150000) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank_micro"),
        )
    return ranks


@register(
    "dedup_minhash_jaccard_est",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
{SQL_MINHASH},
buckets AS (
  SELECT doc_id, CAST(hash_idx // 4 AS INT) AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_idx))
           AS band_digest
  FROM signatures
  GROUP BY doc_id, CAST(hash_idx // 4 AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.band_digest = b.band_digest
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
            AS BIGINT) AS n_agree,
       round(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
             / 16.0, 4) AS est_jaccard
FROM cand c
JOIN signatures sa ON sa.doc_id = c.doc_a
JOIN signatures sb ON sb.doc_id = c.doc_b AND sb.hash_idx = sa.hash_idx
GROUP BY 1, 2
""",
    doc="MinHash Jaccard ESTIMATION on the LSH candidates: the "
    "fraction of agreeing signature components is an unbiased "
    "estimator of the true Jaccard (stderr 1/sqrt(H) ~ 0.25 at "
    "H=16), which ranks/filters candidate pairs WITHOUT touching the "
    "shingle sets again — the middle rung between free LSH discovery "
    "and the exact shingle-join verify (dedup_ngram_jaccard). Scale "
    "shape: signatures are 16 longs per doc, so the pair join "
    "shuffles 128-byte rows regardless of document size; the "
    "estimate is a row-local array comparison. The integer minhash "
    "family is the portable one, so the oracle reproduces every "
    "component agreement exactly.",
)
def dedup_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    H = 16
    sigs = dedup.minhash_signatures_wide(d, num_hashes=H, k=3).persist()
    cand = dedup.minhash_lsh_candidates(
        d, num_hashes=H, rows_per_band=4, k=3
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a{i}") for i in range(H)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b{i}") for i in range(H)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(H)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            agree.cast("long").alias("n_agree"),
            F.round(agree / float(H), 4).alias("est_jaccard"),
        )
    )


@register(
    "dedup_containment_est",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
{SQL_MINHASH},
buckets AS (
  SELECT doc_id, CAST(hash_idx // 4 AS INT) AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_idx))
           AS band_digest
  FROM signatures
  GROUP BY doc_id, CAST(hash_idx // 4 AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.band_digest = b.band_digest
  WHERE a.doc_id < b.doc_id
),
shh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
  FROM sh
),
sizes AS (
  SELECT doc_id, CAST(count(h) AS BIGINT) AS set_size
  FROM shh GROUP BY doc_id
),
agree AS (
  SELECT c.doc_a, c.doc_b,
         CAST(sum(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
              AS BIGINT) AS n_agree
  FROM cand c
  JOIN signatures sa ON sa.doc_id = c.doc_a
  JOIN signatures sb ON sb.doc_id = c.doc_b AND sb.hash_idx = sa.hash_idx
  GROUP BY 1, 2
)
SELECT a.doc_a, a.doc_b, a.n_agree,
       za.set_size AS size_a, zb.set_size AS size_b,
       least(
         (1000000 * a.n_agree * (za.set_size + zb.set_size))
           // ((16 + a.n_agree) * least(za.set_size, zb.set_size)),
         1000000) AS est_containment_ppm
FROM agree a
JOIN sizes za ON za.doc_id = a.doc_a
JOIN sizes zb ON zb.doc_id = a.doc_b
""",
    doc="Containment ESTIMATION on the LSH candidates — the scale "
    "path of dedup_containment, exactly as dedup_minhash_jaccard_est "
    "is the scale path of the exact Jaccard verify. From the Jaccard "
    "estimate J = m/H (m of H=16 signature components agree) and the "
    "EXACT per-doc set sizes (one count-distinct over the shingle "
    "hashes, no pair join), the intersection solves to "
    "I = m(a+b)/(H+m), so containment I/min(a,b) is the integer "
    "rational m(a+b) / ((H+m)·min(a,b)) — reported in floor-division "
    "ppm, engine-exact (all operands nonnegative), clamped at 1e6 "
    "(the raw estimator can exceed 1 when m/H overestimates J; true "
    "containment cannot). Scale shape: the "
    "pair join moves 16 longs per doc; the shingle sets are touched "
    "once for sizes and never per-pair — estimate first, run the "
    "exact verifier only on pairs the estimate shortlists.",
)
def dedup_containment_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    H = 16
    while _CEST_CACHES:
        _CEST_CACHES.pop().unpersist(blocking=False)
    sigs = dedup.minhash_signatures_wide(d, num_hashes=H, k=3).persist()
    _CEST_CACHES.append(sigs)
    cand = dedup.minhash_lsh_candidates(
        d, num_hashes=H, rows_per_band=4, k=3
    )
    sizes = (
        dedup.shingle_sets(d, k=3, distinct=False)
        .select(
            "doc_id",
            (textops.portable_hash32("shingle") % dedup.MERSENNE_P).alias(
                "h"
            ),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("h").alias("set_size"))
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a{i}") for i in range(H)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b{i}") for i in range(H)],
    )
    za = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a")
    )
    zb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b")
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(H)
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", agree.cast("long").alias("n_agree"))
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            "size_a",
            "size_b",
            F.expr(
                "least((1000000 * n_agree * (size_a + size_b)) div "
                "((16 + n_agree) * least(size_a, size_b)), 1000000)"
            ).alias("est_containment_ppm"),
        )
    )


@register(
    "samp_negative_mining",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
  FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id AND e.label != q.q_label
),
ranked AS (
  SELECT query_id, neighbor_id, label, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, CAST(label AS INT) AS neg_label,
       CAST(rn AS INT) AS rank, cos_sim
FROM ranked WHERE rn <= 5
""",
    doc="Hard-negative mining for contrastive training: for each "
    "anchor, the top-5 most-SIMILAR vectors with a DIFFERENT label — "
    "the near-miss negatives that actually move a contrastive loss "
    "(random negatives are trivially separable). The label-mismatch "
    "predicate filters before scoring, anchors broadcast, the corpus "
    "streams once, and per-anchor top-k is a windowed row_number — "
    "the same plan family as sim_bruteforce_topk. At 100 TB the "
    "anchor batch still broadcasts (mining runs in anchor batches), "
    "and the corpus pass swaps to the IVF/LSH bucketed layout: probe "
    "the anchor's nearest buckets, filter labels there, same "
    "verify-exactly-on-candidates discipline as the dedup family.",
)
def samp_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    queries = e.filter(F.col("vec_id").isin([0, 1, 2, 3, 4])).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
        similarity.l2_norm(F.col("embedding")).alias("_q_nrm"),
    )
    corpus = e.select(
        "vec_id",
        "embedding",
        "label",
        similarity.l2_norm(F.col("embedding")).alias("_nrm"),
    )
    pairs = corpus.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id"))
        & (F.col("label") != F.col("q_label")),
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neg_label"),
        F.round(
            similarity.dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("_q_nrm") * F.col("_nrm")),
            4,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "neg_label", "rank", "cos_sim")
    )


@register(
    "dedup_latest_snapshot",
    oracle="""
WITH r AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC)
           AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS latest_order_day,
       o_orderstatus
FROM r WHERE rn = 1
""",
    doc="CDC snapshot compaction — latest record per key: the dedup "
    "every change-capture ingest runs to turn an append-only event "
    "log into current state (the batch analog of the streaming "
    "dropDuplicates + the MERGE target build). row_number over "
    "(key ORDER BY ts DESC, id DESC) with the id tie-break makes "
    "same-timestamp updates deterministic on both engines. One hash "
    "exchange on the key; at 100 TB this runs per ingested partition "
    "and merges via refresh_fact_partitions, never over the full "
    "history. The windowed form beats groupBy+join-back (one shuffle "
    "vs two) and beats max_by (which has no deterministic tie rule).",
)
def dedup_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias(
                "latest_order_day"
            ),
            "o_orderstatus",
        )
    )


@register(
    "w10_range_numeric_frame",
    oracle="""
WITH c AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
  FROM orders
)
SELECT o_orderkey, o_custkey, price_cents,
       CAST(count(*) OVER (
         PARTITION BY o_custkey ORDER BY price_cents
         RANGE BETWEEN 1000000 PRECEDING AND 1000000 FOLLOWING
       ) AS BIGINT) AS n_within_10k,
       CAST(sum(price_cents) OVER (
         PARTITION BY o_custkey ORDER BY price_cents
         RANGE BETWEEN 1000000 PRECEDING AND 1000000 FOLLOWING
       ) AS BIGINT) AS sum_within_10k
FROM c
""",
    doc="Value-based RANGE frame over a NUMERIC ordering (not time): "
    "for each order, how many of the same customer's orders fall "
    "within ±$10k of its price, and their sum — the peer-band "
    "window (price-band comparisons, salary bands, sensor tolerance "
    "groups) that ROWS frames cannot express because the frame edge "
    "is a VALUE offset. Integer-cents ordering keys make the frame "
    "boundary exact on both engines (a float ordering key would "
    "admit/exclude edge rows differently). Same execution shape as "
    "the time-based w6: one hash exchange on the partition key, "
    "in-partition sort, sliding two-pointer frame — no extra "
    "shuffle vs a plain window.",
)
def w10_range_numeric_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    c = o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("price_cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("price_cents")
        .rangeBetween(-1000000, 1000000)
    )
    return c.select(
        "o_orderkey",
        "o_custkey",
        "price_cents",
        F.count(F.lit(1)).over(w).alias("n_within_10k"),
        F.sum("price_cents").over(w).alias("sum_within_10k"),
    )


@register(
    "sk_hll_set_algebra",
    oracle=f"""
WITH ev AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM events
  WHERE strftime(ts, '%Y-%m-%d') IN ('2024-01-05', '2024-01-06')
),
parts AS (
  SELECT day,
         CAST(floor(h / {1 << sketches.HLL_RANK_BITS}.0) AS BIGINT) AS bucket,
         h % {1 << sketches.HLL_RANK_BITS} AS w
  FROM ev
),
regs AS (
  SELECT day, bucket,
         max(CASE WHEN w = 0 THEN {sketches.HLL_RANK_MAX}
                  ELSE {sketches.HLL_RANK_MAX} - length(bin(w)) END)
           AS register
  FROM parts GROUP BY 1, 2
),
uregs AS (SELECT bucket, max(register) AS register FROM regs GROUP BY 1),
est_day AS (
  SELECT day,
         SUM(CAST(power(2, {sketches.HLL_RANK_MAX} - register) AS BIGINT))
           AS sum_occupied,
         COUNT(*) AS n_occupied
  FROM regs GROUP BY 1
),
est_u AS (
  SELECT SUM(CAST(power(2, {sketches.HLL_RANK_MAX} - register) AS BIGINT))
           AS sum_occupied,
         COUNT(*) AS n_occupied
  FROM uregs
),
fin_day AS (
  SELECT day,
         {_HLL_NUM!r} / (sum_occupied + ({sketches.HLL_M} - n_occupied)
                         * {1 << sketches.HLL_RANK_MAX}) AS raw,
         {sketches.HLL_M} - n_occupied AS zeros
  FROM est_day
),
fin_u AS (
  SELECT {_HLL_NUM!r} / (sum_occupied + ({sketches.HLL_M} - n_occupied)
                         * {1 << sketches.HLL_RANK_MAX}) AS raw,
         {sketches.HLL_M} - n_occupied AS zeros
  FROM est_u
),
e_day AS (
  SELECT day,
         round(CASE WHEN raw <= {2.5 * sketches.HLL_M!r} AND zeros > 0
                    THEN {float(sketches.HLL_M)!r}
                         * ln({float(sketches.HLL_M)!r} / zeros)
                    ELSE raw END, 4) AS est
  FROM fin_day
),
e_u AS (
  SELECT round(CASE WHEN raw <= {2.5 * sketches.HLL_M!r} AND zeros > 0
                    THEN {float(sketches.HLL_M)!r}
                         * ln({float(sketches.HLL_M)!r} / zeros)
                    ELSE raw END, 4) AS est_union
  FROM fin_u
)
SELECT '2024-01-05' AS day_a, '2024-01-06' AS day_b,
       a.est AS est_a, b.est AS est_b, u.est_union,
       round(a.est + b.est - u.est_union, 4) AS est_intersect
FROM (SELECT est FROM e_day WHERE day = '2024-01-05') a
CROSS JOIN (SELECT est FROM e_day WHERE day = '2024-01-06') b
CROSS JOIN e_u u
""",
    doc="HLL set algebra — the property that makes sketches a "
    "STORAGE format, not just a query shortcut: per-day register "
    "files merge by per-bucket MAX into the union's registers "
    "(lossless for the union estimate — identical to sketching the "
    "concatenated days), and the two-day user overlap follows by "
    "inclusion-exclusion WITHOUT ever re-scanning events. At 100 TB "
    "this is how any date-range distinct count is answered from 64-"
    "row daily sketch files instead of the raw log; the intersection "
    "inherits both estimates' error (fine for overlap dashboards, "
    "not for joins). All register math is integer-exact from the "
    "portable hash, so even the approximations cross-check "
    "bit-for-bit.",
)
def sk_hll_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    day_a, day_b = "2024-01-05", "2024-01-06"
    two = e.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).filter(F.col("day").isin(day_a, day_b))
    regs = sketches.hll_registers(two, ["day"], F.col("user_id")).persist()
    per_day = sketches.hll_estimate(regs, ["day"])
    union_regs = regs.groupBy("bucket").agg(
        F.max("register").alias("register")
    )
    est_u = sketches.hll_estimate(union_regs, []).select(
        F.col("approx_distinct").alias("est_union")
    )
    a = per_day.filter(F.col("day") == day_a).select(
        F.col("approx_distinct").alias("est_a")
    )
    b = per_day.filter(F.col("day") == day_b).select(
        F.col("approx_distinct").alias("est_b")
    )
    return (
        a.crossJoin(b)
        .crossJoin(est_u)
        .select(
            F.lit(day_a).alias("day_a"),
            F.lit(day_b).alias("day_b"),
            "est_a",
            "est_b",
            "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_intersect"),
        )
    )


@register(
    "samp_soft_dedup",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
),
corpus AS (
  SELECT doc_id, h FROM base
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, h FROM base WHERE doc_id < 50
),
grp AS (
  SELECT h, CAST(count(*) AS BIGINT) AS dup_count
  FROM corpus GROUP BY h
)
SELECT c.doc_id, g.dup_count,
       CASE WHEN ('0x' || substr(md5('soft|' || CAST(c.doc_id AS VARCHAR)),
                                 1, 8))::BIGINT % g.dup_count = 0
            THEN 1 ELSE 0 END AS kept
FROM corpus c JOIN grp g ON c.h = g.h
""",
    doc="Soft (probabilistic) dedup — the RefinedWeb/Gopher policy of "
    "DOWNWEIGHTING duplicates instead of hard-keeping one: each copy "
    "in an n-way duplicate cluster survives iff its salted hash "
    "falls in the 1/n bucket, so a cluster contributes ~1 expected "
    "copy while unique docs always survive (dup_count=1 -> any hash "
    "% 1 == 0). Deterministic, partition/order-invariant (pure "
    "function of doc_id + cluster size — same sampling contract as "
    "samp_hash_split), and it preserves natural-distribution mass "
    "where hard dedup would bias toward first occurrences. Shape: "
    "one groupBy on the text md5 + one hash join back on the digest "
    "— text never shuffles; at 100 TB the join broadcasts nothing "
    "and AQE handles the dup-cluster skew.",
)
def samp_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    base = d.select(
        "doc_id", F.md5(textops.normalize_text(F.col("text"))).alias("h")
    )
    corpus = base.unionByName(
        base.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "h"
        )
    )
    grp = corpus.groupBy("h").agg(F.count(F.lit(1)).alias("dup_count"))
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit("soft"), F.col("doc_id"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return corpus.join(grp, "h").select(
        "doc_id",
        "dup_count",
        F.when(bucket % F.col("dup_count") == 0, 1)
        .otherwise(0)
        .alias("kept"),
    )


@register(
    "f8_calendar_features",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS day,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(day(last_day(CAST(o_orderdate AS DATE))) AS INT)
         AS days_in_month,
       CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 ELSE 0 END
         AS is_weekend
FROM orders
WHERE o_orderkey % 10 = 0
""",
    doc="Calendar feature derivation — the date-dimension enrichment "
    "the reference computes in its time_period build (`Olist "
    "DW.sql:44-56` derives year/month columns; this extends to the "
    "quarter/month-length/weekend features a seasonality model "
    "needs). The portability trap this op documents: WEEKDAY "
    "NUMBERING IS A CONVENTION, not a fact — Spark's dayofweek() is "
    "1-based Sunday-start, DuckDB's is 0-based — so the registered "
    "contract exposes only the convention-free derivation "
    "(is_weekend), and week-of-year is deliberately absent (ISO vs "
    "US week rules differ between engines). All expressions are "
    "codegen'd scan-stage projections: zero shuffle at any scale.",
)
def f8_calendar_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    d = F.col("o_orderdate")
    return o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("day"),
        F.quarter(d).alias("qtr"),
        F.dayofmonth(d).alias("dom"),
        F.dayofmonth(F.last_day(d)).alias("days_in_month"),
        F.when(F.dayofweek(d).isin(1, 7), 1).otherwise(0).alias(
            "is_weekend"
        ),
    )


@register(
    "a21_multi_distinct",
    oracle="""
SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS yr,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1
""",
    doc="Multiple COUNT(DISTINCT ...) over different columns in one "
    "aggregate — the query shape that FORCES Spark's Expand plan "
    "(each input row replicates once per distinct column, tagged "
    "with a grouping id, then two aggregation phases dedup and "
    "count) — deliberately registered as the cost counterpoint to "
    "cohort_retention's single-distinct no-Expand plan: shuffle "
    "volume here is ~(#distinct-cols + 1) x input, the one case "
    "where adding 'just one more distinct' multiplies the exchange. "
    "At 100 TB the swap is one HLL sketch per column "
    "(sk_hll_daily_users pattern): fixed 64-row register files per "
    "group instead of an input-sized Expand, at ~13 pct error.",
)
def a21_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "w11_ratio_to_report",
    oracle="""
WITH c AS (
  SELECT n_name,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
  FROM customer JOIN nation ON c_nationkey = n_nationkey
),
g AS (
  SELECT n_name, CAST(SUM(bal_cents) AS BIGINT) AS nation_cents
  FROM c GROUP BY 1
)
SELECT n_name, nation_cents,
       round(nation_cents / CAST(SUM(nation_cents) OVER () AS DOUBLE), 4)
         AS share_of_total
FROM g
""",
    doc="Ratio-to-report — each nation's share of total balance: an "
    "aggregate followed by an UNPARTITIONED window over the "
    "aggregate's tiny output. The ordering of the two steps is the "
    "whole scale story: the global SUM OVER () runs on ~25 "
    "nation-grain rows (a single-partition exchange of the REPORT, "
    "which is O(groups)), never on the input — the naive "
    "one-level form (window over raw rows) would single-partition "
    "the entire fact. Dim join broadcasts; integer cents make "
    "numerator and denominator exact, so the 4dp share is identical "
    "on both engines.",
)
def w11_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = _t(spark, sf_dir, "customer", "nation")
    c = t["customer"].join(
        F.broadcast(t["nation"]),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    g = c.groupBy("n_name").agg(
        F.sum(
            F.round(F.col("c_acctbal") * 100, 0).cast("long")
        ).alias("nation_cents")
    )
    w = Window.partitionBy()
    return g.select(
        "n_name",
        "nation_cents",
        F.round(
            F.col("nation_cents")
            / F.sum("nation_cents").over(w).cast("double"),
            4,
        ).alias("share_of_total"),
    )


@register(
    "w12_rank_variants",
    oracle="""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
  FROM customer WHERE c_custkey % 7 = 0
)
SELECT c_custkey, c_nationkey, bal_cents,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk
FROM c
WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal_cents DESC, c_custkey)
""",
    doc="The three ranking semantics side by side on one ordering — "
    "row_number (arbitrary-but-deterministic via the key tie-break), "
    "rank (gaps after ties), dense_rank (no gaps): the distinction "
    "that silently changes top-k row counts when ties exist, made "
    "explicit as a single registered contract. All three share one "
    "window spec, so Catalyst plans ONE exchange + one sort (same "
    "merge rule the w9 pin covers); the c_custkey tie-break makes "
    "even row_number engine-exact.",
)
def w12_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = (
        _t(spark, sf_dir, "customer")["customer"]
        .filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            "c_nationkey",
            F.round(F.col("c_acctbal") * 100, 0)
            .cast("long")
            .alias("bal_cents"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("bal_cents"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "bal_cents",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "set_except_all",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_custkey % 3 = 0
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_custkey % 3 = 1
""",
    doc="EXCEPT ALL — multiplicity-aware set difference (each "
    "occurrence on the right cancels ONE occurrence on the left), "
    "completing the set-op family beyond the DISTINCT forms "
    "(set_except): the bag semantics audits need when comparing "
    "event logs where duplicate rows are legitimate. Spark plans it "
    "as a counted aggregate on both sides + a generate of the "
    "surviving multiplicities — one exchange per side on the row "
    "value, output replicated without ever materializing either "
    "input twice.",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    a = o.filter(F.col("o_custkey") % 3 == 0).select("o_orderpriority")
    b = o.filter(F.col("o_custkey") % 3 == 1).select("o_orderpriority")
    return a.exceptAll(b)


@register(
    "dedup_cdc_chunks",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
b AS (
  SELECT doc_id, toks,
         list_filter(generate_series(1, len(toks)),
                     i -> ('0x' || substr(md5(toks[i]), 1, 8))::BIGINT
                          % 16 = 0) AS bounds
  FROM tok WHERE len(toks) >= 1
),
se AS (
  SELECT doc_id, toks,
         list_prepend(1, list_transform(bounds, x -> x + 1)) AS starts,
         list_append(bounds, len(toks)) AS ends
  FROM b
),
ch0 AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(starts)),
           j -> CASE WHEN ends[j] >= starts[j]
                     THEN array_to_string(toks[starts[j]:ends[j]], ' ')
                END) AS chs
  FROM se
),
ch AS (
  SELECT doc_id, generate_subscripts(chs, 1) - 1 AS idx,
         unnest(chs) AS chunk
  FROM ch0
),
occ AS (
  SELECT doc_id, md5(chunk) AS h, doc_id * 100000 + idx AS k
  FROM ch WHERE chunk IS NOT NULL
),
mins AS (SELECT h, MIN(k) AS mk FROM occ GROUP BY h)
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN o.k = m.mk THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       round(sum(CASE WHEN o.k = m.mk THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS retained_ratio
FROM occ o JOIN mins m ON o.h = m.h
GROUP BY 1
""",
    doc="Content-defined-chunk dedup — the insertion-robust upgrade of "
    "dedup_span_chunks: boundaries fall where a token's hash ≡ 0 "
    "(mod 16), so an edit redraws only the chunk it touches and all "
    "later chunks realign and still dedup (fixed spans shift and "
    "miss everything downstream of an insertion — the property test "
    "pins this difference). Chunking is pure Catalyst array algebra "
    "in the scan stage; the first-occurrence pass is the same "
    "skew-splittable aggregate+join-on-md5 as the span form, so the "
    "shuffle again moves 32-hex keys, never text.",
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    ch = dedup.cdc_chunks(d, divisor=16)
    occ = ch.select(
        "doc_id",
        F.md5("chunk").alias("h"),
        (F.col("doc_id") * 100000 + F.col("idx")).alias("k"),
    )
    mins = occ.groupBy("h").agg(F.min("k").alias("mk"))
    kept = F.when(F.col("k") == F.col("mk"), 1).otherwise(0)
    return (
        occ.join(mins, "h")
        .withColumn("kept", kept)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("kept").alias("n_kept"),
        )
        .withColumn(
            "retained_ratio",
            F.round(F.col("n_kept") / F.col("n_chunks").cast("double"), 4),
        )
    )


@register(
    "json_variant_extract",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       min(json_extract_string(props, '$.k')) AS min_k_str
FROM events
WHERE props IS NOT NULL
GROUP BY event_type
""",
    doc="Semi-structured extraction via Spark 4's VARIANT type: "
    "parse_json() decodes the payload ONCE into a binary variant, "
    "and every variant_get() reads from that decoded form — vs "
    "get_json_object (json_props_extract), which re-parses the "
    "string for EACH extracted path. With one field the two tie; "
    "with the 20-field payloads real event logs carry, parse-once "
    "is the difference between 1 and 20 JSON scans per row, which "
    "is why variant is the lakehouse-native semi-structured "
    "encoding (store the variant column, skip the parse entirely). "
    "Both a typed bigint and a string extraction come off the same "
    "parse; string MIN is lexicographic on both engines.",
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    v = F.parse_json(F.col("props"))
    k_long = F.variant_get(v, "$.k", "bigint")
    k_str = F.variant_get(v, "$.k", "string")
    return (
        ev.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k_long).alias("sum_k"),
            F.min(k_str).alias("min_k_str"),
        )
    )


# ---------------------------------------------------------------------------
# Retrieval primitives: inverted index and BM25 ranking
# ---------------------------------------------------------------------------


@register(
    "text_inverted_index",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
words AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
postings AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS posting_list
  FROM words
  WHERE term != '' AND term NOT IN ({_STOPWORDS_SQL})
  GROUP BY term
)
SELECT term, df, posting_list FROM postings WHERE df >= 2
""",
    doc="Inverted-index build (term -> sorted posting list + document "
    "frequency): the search-engine/RAG-retrieval primitive over a "
    "corpus. One shuffle: tokens explode map-side and collect_set's "
    "partial aggregate dedups (doc, term) pairs BEFORE the exchange, "
    "so shuffle volume is bounded by distinct (term, doc) — never the "
    "raw token stream. Postings serialize as a canonical "
    "ascending-id CSV string (the portable array encoding, like "
    "a18's histogram). At 100 TB the posting list for a stop-like "
    "term is the classic hot key — the stopword filter here is the "
    "skew fuse, and a df cap (like dedup's max_shingle_df) is the "
    "documented knob when the corpus vocabulary is open.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    return (
        d.select("doc_id", F.explode(textops.tokens("text")).alias("term"))
        .filter(
            (F.col("term") != "") & ~F.col("term").isin(*textops.STOPWORDS)
        )
        .groupBy("term")
        .agg(F.collect_set("doc_id").alias("_docs"))
        .select(
            "term",
            F.size("_docs").cast("long").alias("df"),
            F.array_join(
                F.transform(
                    F.array_sort("_docs"), lambda x: x.cast("string")
                ),
                ",",
            ).alias("posting_list"),
        )
        .filter(F.col("df") >= 2)
    )


@register(
    "text_keywords_topk",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  WHERE term != '' AND term NOT IN ({_STOPWORDS_SQL})
  GROUP BY 1, 2
),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * CAST(floor(1000000.0 *
           (ln(CAST(n.n_docs + 1 AS DOUBLE) / (d.df + 1)) + 1.0))
           AS BIGINT) AS w
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, w,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY w DESC, term) AS rn
  FROM w
)
SELECT doc_id,
       string_agg(term, ',' ORDER BY rn) AS keywords
FROM ranked WHERE rn <= 3 GROUP BY doc_id
""",
    doc="Keyword extraction: each document's top-3 TF-IDF terms "
    "(stopwords excluded) as a deterministic rank-ordered CSV — the "
    "tagging/snippeting pass search and labeling pipelines run over "
    "a corpus. Weights reuse the integer micro-nat idf discipline "
    "(one ln per TERM, BIGINT products), so ranks — and the CSV — "
    "are engine-exact with (weight desc, term) tie-breaks. Plan: the "
    "tf aggregate's exchange is the only fact-scale shuffle (token "
    "stream -> (doc, term) pairs, partial-combined map-side); df "
    "joins back vocabulary-sized as a broadcast, and the per-doc "
    "window re-keys the already-collapsed (doc, term, weight) rows — "
    "a doc-grain exchange, orders of magnitude below the token "
    "stream.",
)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    tf = (
        d.select("doc_id", F.explode(textops.tokens("text")).alias("term"))
        .filter(
            (F.col("term") != "") & ~F.col("term").isin(*textops.STOPWORDS)
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.floor(
                    F.lit(1000000.0)
                    * (
                        F.log(
                            (F.col("n_docs") + 1).cast("double")
                            / (F.col("df") + 1)
                        )
                        + 1.0
                    )
                ).cast("long")
            ).alias("w"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("term"))
    return (
        w.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 3)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "term"))
                    ),
                    lambda s: s["term"],
                ),
                ",",
            ).alias("keywords")
        )
    )


@register(
    "ivm_index_merge",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
words AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tok),
postings AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS posting_list
  FROM words
  WHERE term != '' AND term NOT IN ({_STOPWORDS_SQL})
  GROUP BY term
)
SELECT term, df, posting_list FROM postings WHERE df >= 2
""",
    doc="Incremental VIEW MAINTENANCE for the inverted index: the "
    "engine builds a BASE index over 90% of the corpus and a DELTA "
    "index over the new 10%, then merges postings per term "
    "(array_union of the doc sets, df = merged size) — and the oracle "
    "is the FULL REBUILD over everything, so the gate proves "
    "merge(index(A), index(B)) == index(A ∪ B) exactly. This is the "
    "set-valued sibling of ivm_agg_merge's distributive sums: "
    "collect_set is mergeable, so a nightly index refresh costs one "
    "pass over the delta plus a term-keyed join against the base — "
    "never a corpus rebuild. The df >= 2 publication filter applies "
    "AFTER the merge (a term can cross the threshold when the delta "
    "lands), exactly as a rebuild would.",
)
def ivm_index_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]

    def side_index(part: DataFrame) -> DataFrame:
        return (
            part.select(
                "doc_id", F.explode(textops.tokens("text")).alias("term")
            )
            .filter(
                (F.col("term") != "")
                & ~F.col("term").isin(*textops.STOPWORDS)
            )
            .groupBy("term")
            .agg(F.collect_set("doc_id").alias("docs"))
        )

    base = side_index(d.filter(F.col("doc_id") % 10 != 0))
    delta = side_index(d.filter(F.col("doc_id") % 10 == 0))
    empty = F.array().cast("array<bigint>")
    merged = (
        base.select("term", F.col("docs").alias("b_docs"))
        .join(
            delta.select("term", F.col("docs").alias("d_docs")),
            "term",
            "full_outer",
        )
        .select(
            "term",
            F.array_union(
                F.coalesce("b_docs", empty), F.coalesce("d_docs", empty)
            ).alias("docs"),
        )
    )
    return (
        merged.select(
            "term",
            F.size("docs").cast("long").alias("df"),
            F.array_join(
                F.transform(F.array_sort("docs"), lambda x: x.cast("string")),
                ",",
            ).alias("posting_list"),
        )
        .filter(F.col("df") >= 2)
    )


# Fixed retrieval query for the BM25 demo: three mid-frequency corpus
# terms. A real system parameterizes this; a fixed literal keeps the
# entry deterministic and oracle-checkable.
_BM25_TERMS = ("spark", "merge", "window")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
# Bounded cache scope for the BM25 narrow token-stats frame — at most
# one call's cache resident per session (mmr_rerank convention).
_BM25_CACHES: list[DataFrame] = []
# Same convention for dedup_containment_est's signature frame.
_CEST_CACHES: list[DataFrame] = []


@register(
    "text_bm25_topk",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM tok),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl
  FROM base
),
tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base)
  WHERE term IN ({_BM25_TERMS_SQL})
  GROUP BY doc_id, dl, term
),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT t.doc_id,
         CAST(floor(1000000.0 * ln(
           CAST(2 * s.n_docs + 2 AS DOUBLE) / CAST(2 * d.df + 1 AS DOUBLE)
         )) AS BIGINT) AS idf_micro,
         t.tf, t.dl, s.n_docs, s.sum_dl
  FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
),
contrib AS (
  SELECT doc_id,
         (idf_micro * tf * 22000000) //
           (10000000 * tf + 3000000 +
            9 * ((1000000 * dl * n_docs) // sum_dl)) AS sc
  FROM scored
)
SELECT doc_id, CAST(sum(sc) AS BIGINT) AS score_micro,
       CAST(count(*) AS BIGINT) AS n_terms_hit
FROM contrib GROUP BY doc_id
ORDER BY score_micro DESC, doc_id LIMIT 10
""",
    doc="BM25 ranked retrieval (k1=1.2, b=0.75) for a fixed query-term "
    "set, exact-integer micro-units: the per-term score "
    "idf*tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) is algebraically "
    "cleared of fractions — multiply through by 10*sum_dl — so the "
    "only float is one ln() per QUERY TERM (floored to micro-nats, "
    "the unigram_logprob precedent); every per-document operation is "
    "BIGINT arithmetic with identical floor-division semantics on "
    "both engines (all operands nonnegative, so Spark's div and "
    "DuckDB's // agree). Plan shape: tf filters to query terms "
    "map-side (the explode never shuffles non-query tokens), df and "
    "the corpus stats are one-row/3-row broadcasts, and the top-10 "
    "is TakeOrderedAndProject. At 100 TB this is one shuffle of "
    "(doc, term in query) — the textbook 'score only the candidate "
    "postings' retrieval plan.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    # ONE tokenize pass (tokenization — normalize + regex split — is
    # the dominant per-row cost): a single array filter keeps only
    # query-term occurrences per doc, so the persisted narrow frame is
    # (doc_id, dl, qtoks) with |qtoks| = query-term hits (tiny), and
    # the stats branch and the tf branch share the one tokenize scan.
    # Non-query tokens are never exploded into rows; the explode that
    # remains runs codegen over the tiny arrays. Bounded cache scope
    # per the mmr_rerank convention.
    toks = textops.tokens("text")
    def is_query_term(x):
        cond = x == F.lit(_BM25_TERMS[0])
        for t in _BM25_TERMS[1:]:
            cond = cond | (x == F.lit(t))
        return cond
    narrow = d.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        F.size("toks").cast("long").alias("dl"),
        F.filter("toks", is_query_term).alias("qtoks"),
    )
    while _BM25_CACHES:
        _BM25_CACHES.pop().unpersist(blocking=False)
    narrow = narrow.persist()
    _BM25_CACHES.append(narrow)
    stats = narrow.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        narrow.select("doc_id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(
                F.lit(1000000.0)
                * F.log(
                    (2 * F.col("n_docs") + 2).cast("double")
                    / (2 * F.col("df") + 1).cast("double")
                )
            )
            .cast("long")
            .alias("idf_micro"),
            "tf",
            "dl",
            "n_docs",
            "sum_dl",
        )
    )
    contrib = scored.select(
        "doc_id",
        F.expr(
            "(idf_micro * tf * 22000000) div "
            "(10000000 * tf + 3000000 + "
            " 9 * ((1000000 * dl * n_docs) div sum_dl))"
        ).alias("sc"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("sc").alias("score_micro"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(10)
    )


# Fixed phrase for the positional-index demo, chosen mid-frequency in
# the corpus. A real system parameterizes this; the literal keeps the
# entry deterministic and oracle-checkable.
_PHRASE = ("table", "hash")


@register(
    "text_phrase_search",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
pos AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS p, unnest(toks) AS w
  FROM tok
),
p1 AS (SELECT doc_id, p FROM pos WHERE w = '{_PHRASE[0]}'),
p2 AS (SELECT doc_id, p FROM pos WHERE w = '{_PHRASE[1]}'),
hits AS (
  SELECT p1.doc_id, p1.p FROM p1
  JOIN p2 ON p1.doc_id = p2.doc_id AND p2.p = p1.p + 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(p) AS BIGINT) AS first_pos
FROM hits GROUP BY doc_id
""",
    doc="Exact phrase search via POSITIONAL postings — the retrieval "
    "shape, not a corpus scan: docs containing both terms are pruned "
    "first with array_contains predicates evaluated inside the scan "
    "(cheap containment before any explode), then each term's "
    "(doc, position) postings equi-join on (doc, adjacent position). "
    "At 100 TB this is how phrase queries run against an index: join "
    "the two rarest terms' postings — cost scales with posting-list "
    "sizes, never corpus size. The scan-side alternative (a zip_with "
    "over each doc's token array) is the right shape only when there "
    "is no index; this entry demonstrates the indexed plan. Positions "
    "are 1-based in both engines.",
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    toks = textops.tokens("text")
    both = d.filter(
        F.array_contains(toks, _PHRASE[0]) & F.array_contains(toks, _PHRASE[1])
    )
    pos = both.select(
        "doc_id", F.posexplode(toks).alias("p0", "term")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "term")
    p1 = pos.filter(F.col("term") == _PHRASE[0]).select("doc_id", "p")
    p2 = pos.filter(F.col("term") == _PHRASE[1]).select(
        "doc_id", F.col("p").alias("p2")
    )
    hits = p1.join(
        p2, (p1.doc_id == p2.doc_id) & (F.col("p2") == F.col("p") + 1)
    ).select(p1.doc_id, "p")
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p").alias("first_pos"),
    )


@register(
    "sim_tfidf_cosine",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
  WHERE term != '' GROUP BY 1, 2
),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * CAST(floor(1000000.0 *
           (ln(CAST(n.n_docs + 1 AS DOUBLE) / (d.df + 1)) + 1.0))
           AS BIGINT) AS w
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n
),
nrm AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM w GROUP BY doc_id),
dot AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(a.w * b.w) AS BIGINT) AS dp
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(dp / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2), 4) AS cos_sim
FROM dot
JOIN nrm na ON na.doc_id = doc_a
JOIN nrm nb ON nb.doc_id = doc_b
WHERE round(dp / sqrt(CAST(na.n2 AS DOUBLE) * nb.n2), 4) >= 0.85
""",
    doc="SPARSE document similarity — TF-IDF cosine over shared-term "
    "posting lists, the bag-of-words counterpart of the dense "
    "embedding ANN family: pairs meet only through terms they share "
    "(an equi-join on term), so candidate volume is Σ_terms C(df, 2) "
    "— bounded by document frequency, never |docs|². Weights are "
    "exact integers (tf × micro-nat idf, the BM25 precedent: ONE "
    "ln() per TERM floored to micro units, then pure BIGINT "
    "products), so dot products and squared norms hash identically "
    "on both engines; the only per-pair float is the final "
    "sqrt/divide, correctly-rounded IEEE ops on identical integer "
    "inputs. At open vocabulary the df cap (drop terms with df > "
    "cap, the stop-term fuse shared with n-gram dedup and the "
    "inverted index) bounds the hot-term quadratic term; norms are "
    "computed once per doc, and only ids + weights shuffle — the "
    "text never moves; the posting join is salted (probe side by doc "
    "hash, build side replicated per salt) so one hot term's df² "
    "products can never serialize into a single task. NOTE the "
    "synthetic corpus is this operator's adversarial case, measured "
    "by tools/scale_audit.py: a ~31-term closed vocabulary makes "
    "df ≈ N for every term (all stop-terms, nothing cappable — a "
    "df cap strips so much weight mass the remaining rare-term "
    "vectors are all trivially cosine≈1, and the AllPairs prefix "
    "filter still leaves ~C(N,2) candidates, both measured), so "
    "~all doc pairs share terms and the partial aggregation over "
    "the Σdf² pair products is inherently quadratic here (~44s at "
    "sf0.1 vs 1.4s at sf0.01). The entry is correctness-gated at "
    "the small SFs and deliberately not in the sf0.1 bench; real "
    "corpora have open vocabularies where the df bound does the "
    "work and the salt keeps the surviving hot terms parallel.",
)
def sim_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    tf = (
        d.select(
            "doc_id", F.explode(textops.tokens("text")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = tf.agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.floor(
                    F.lit(1000000.0)
                    * (
                        F.log(
                            (F.col("n_docs") + 1).cast("double")
                            / (F.col("df") + 1)
                        )
                        + 1.0
                    )
                ).cast("long")
            ).alias("w"),
        )
    ).persist()
    nrm = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2")
    )
    # Salted posting join: `term` alone is a catastrophic shuffle key —
    # a vocabulary-bounded key domain (~31 terms here; hot stop-terms
    # in any open vocabulary) serializes the hottest term's df² pair
    # products into ONE task (measured 46.9s at sf0.1, 32.8x the
    # sf0.01 time — tools/scale_audit.py's first catch). Salting the
    # probe side by doc hash and replicating the build side per salt
    # (the skew_salted_join pattern) splits each term's work S ways:
    # same products, same answer, max task df²/S.
    n_salt = 32
    a = w.select(
        F.col("doc_id").alias("doc_a"),
        "term",
        F.col("w").alias("wa"),
        F.pmod(F.hash("doc_id"), F.lit(n_salt)).alias("_salt"),
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    ).withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    dot = (
        a.join(b, ["term", "_salt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dp"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb"))
    cos = F.round(
        F.col("dp") / F.sqrt(F.col("na").cast("double") * F.col("nb")), 4
    )
    return (
        dot.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.85)
    )


# ---------------------------------------------------------------------------
# Entity resolution, time-series bars, and exact z-score outliers
# ---------------------------------------------------------------------------


@register(
    "link_fuzzy_parts",
    oracle="""
WITH named AS (
  SELECT p_partkey, p_name, string_split(p_name, ' ')[2] AS noun
  FROM part
),
pairs AS (
  SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
         a.p_name AS name_a, b.p_name AS name_b,
         CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
  FROM named a JOIN named b ON a.noun = b.noun
  WHERE a.p_partkey < b.p_partkey
    AND abs(length(a.p_name) - length(b.p_name)) <= 4
)
SELECT part_a, part_b, name_a, name_b, edit_dist
FROM pairs WHERE edit_dist <= 4
ORDER BY edit_dist, part_a, part_b LIMIT 15
""",
    doc="Fuzzy record linkage (entity resolution): near-identical part "
    "names found by BLOCKED pairwise edit distance — the classic "
    "dedupe/Splink shape. Blocking key = the name's noun token, so "
    "candidate pairs come from an equi hash join on the block, never "
    "an all-pairs cross join. The kernel is tiered, cheapest first: "
    "(1) a length-difference bound (|len_a − len_b| > k implies "
    "edit_dist > k — provably lossless) discards pairs before any "
    "DP; (2) the survivors run BANDED levenshtein with threshold=k "
    "(O(len·k) per pair, not O(len²); distances above k report as "
    "-1 and drop — same accept set, ~10× less work). The oracle "
    "applies the same length bound and an unbanded levenshtein — "
    "identical accept set, per-pair cost is the engine's problem. "
    "At 100 TB block size is the skew knob — a hot block degrades "
    "to quadratic exactly like an LSH bucket, and the same "
    "cap-and-drop fuse (dedup.max_shingle_df, "
    "embedding_lsh.max_bucket_size) applies. Top-k ordered by "
    "(distance, ids) for a deterministic k-boundary.",
)
def link_fuzzy_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    named = p.select(
        "p_partkey",
        "p_name",
        F.split("p_name", " ").getItem(1).alias("noun"),
    )
    a = named.select(
        F.col("p_partkey").alias("part_a"),
        F.col("p_name").alias("name_a"),
        "noun",
    )
    b = named.select(
        F.col("p_partkey").alias("part_b"),
        F.col("p_name").alias("name_b"),
        "noun",
    )
    # Parallelism, not per-pair cost, is the first-order term: the part
    # scan is one small-file partition, and a broadcast join inherits
    # the PROBE side's partitioning — without the repartition the whole
    # quadratic block kernel runs in a single task. Round-robin
    # spreading the probe rows balances work by construction: each
    # probe row carries ~its block's size worth of DP calls, and rows
    # of a hot block scatter uniformly, so no salting is needed (the
    # same reason the skew-join salt replicates the BUILD side).
    return (
        a.repartition(64)
        .join(F.broadcast(b), "noun")
        .filter(
            (F.col("part_a") < F.col("part_b"))
            # lossless tier-1 reject: k edits change length by <= k
            & (
                F.abs(F.length("name_a") - F.length("name_b")) <= F.lit(4)
            )
        )
        .select(
            "part_a",
            "part_b",
            "name_a",
            "name_b",
            # banded DP: O(len*k) per pair; > threshold reports -1
            F.levenshtein("name_a", "name_b", 4).cast("long").alias(
                "edit_dist"
            ),
        )
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= 4))
        .orderBy("edit_dist", "part_a", "part_b")
        .limit(15)
    )


@register(
    "ts_ohlc_bars",
    oracle="""
WITH ranked AS (
  SELECT event_type, value,
         epoch_us(ts) // 900000000 AS bucket,
         row_number() OVER (
           PARTITION BY event_type, epoch_us(ts) // 900000000
           ORDER BY ts, event_id) AS rn,
         count(*) OVER (
           PARTITION BY event_type, epoch_us(ts) // 900000000) AS cnt
  FROM events
)
SELECT event_type, bucket,
       max(CASE WHEN rn = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rn = cnt THEN value END) AS close,
       CAST(count(*) AS BIGINT) AS n_events
FROM ranked
GROUP BY event_type, bucket
""",
    doc="Time-series resampling into 15-minute OHLC bars per event "
    "type — the downsampling pass every metrics/trading pipeline "
    "runs before charting or feature extraction. Open/close are "
    "first/last VALUE by (ts, event_id) — pure selection, so the "
    "doubles pass through untouched and hash identically on both "
    "engines (no float arithmetic, unlike an average). The bucket is "
    "integer floor-division of epoch micros (operands nonnegative: "
    "div == //). Plan shape: ONE exchange on the implicit "
    "(event_type, bucket) grain — the row_number sort, the peer "
    "count, and the final aggregate all reuse it; at 100 TB this is "
    "a single shuffle of (type, bucket, value, ts) with the "
    "aggregate's partial combine doing the compaction.",
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    b = e.select(
        "event_type",
        "value",
        "ts",
        "event_id",
        F.expr("unix_micros(ts) div 900000000").alias("bucket"),
    )
    wo = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    wp = Window.partitionBy("event_type", "bucket")
    ranked = b.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    return ranked.groupBy("event_type", "bucket").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("cnt"), F.col("value"))).alias(
            "close"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "dq_zscore_outliers",
    oracle="""
WITH cents AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
  FROM orders
),
g AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS HUGEINT) AS s,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
  FROM cents GROUP BY o_orderpriority
),
flagged AS (
  SELECT c.o_orderpriority, c.o_orderkey,
         (g.n * c.c - g.s) AS dev,
         (g.n * g.q - g.s * g.s) AS nvar
  FROM cents c JOIN g USING (o_orderpriority)
)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN dev > 0 AND dev * dev > 4 * nvar
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_out_2s,
       CAST(sum(CASE WHEN dev > 0 AND dev * dev > 9 * nvar
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_out_3s,
       min(CASE WHEN dev > 0 AND dev * dev > 9 * nvar
                THEN o_orderkey END) AS first_out_3s_key
FROM flagged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Exact distributed z-score outlier detection, zero floating "
    "point: x > mean + k*sigma is cross-multiplied into the pure-"
    "integer predicate (n*x - S) > 0 AND (n*x - S)^2 > k^2*(n*Q - "
    "S^2) over cents (S = sum, Q = sum of squares), so the 2-sigma "
    "and 3-sigma flags are bit-identical on any engine and any "
    "partitioning — no sqrt, no variance epsilon, no float "
    "accumulation order. Squares ride in DECIMAL(38,0) (Spark) / "
    "HUGEINT (DuckDB), both exact 128-bit integer arithmetic; "
    "intermediate only — outputs are BIGINT (the oracle type guard "
    "bans DECIMAL columns). Plan: one map-side-combined aggregate "
    "for the 5-row group stats, broadcast back over the scan, "
    "re-aggregate — two passes, no sort, no window; at 100 TB the "
    "fact shuffles once (and the first pass's 5-row result is a "
    "plan-time broadcast).",
)
def dq_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    cents = o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    )
    dec = F.col("c").cast("decimal(19,0)")
    g = cents.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s"),
        F.sum(dec * dec).alias("q"),
    )
    flagged = cents.join(F.broadcast(g), "o_orderpriority").select(
        "o_orderpriority",
        "o_orderkey",
        (F.col("n") * F.col("c") - F.col("s")).alias("dev"),
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias("nvar"),
    )
    out2 = (F.col("dev") > 0) & (
        F.col("dev") * F.col("dev") > 4 * F.col("nvar")
    )
    out3 = (F.col("dev") > 0) & (
        F.col("dev") * F.col("dev") > 9 * F.col("nvar")
    )
    return (
        flagged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(out2, 1).otherwise(0)).cast("long").alias("n_out_2s"),
            F.sum(F.when(out3, 1).otherwise(0)).cast("long").alias("n_out_3s"),
            F.min(F.when(out3, F.col("o_orderkey"))).alias(
                "first_out_3s_key"
            ),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "dq_psi_splits",
    oracle="""
WITH s AS (
  SELECT doc_id, n_chars,
         CASE WHEN ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                    1, 8))::BIGINT % 10000 < 8000
              THEN 1 ELSE 0 END AS is_train
  FROM documents
),
b AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM s),
bucketed AS (
  SELECT is_train,
         LEAST(((n_chars - b.lo) * 10) // (b.hi - b.lo + 1),
               CAST(9 AS BIGINT)) AS bucket
  FROM s CROSS JOIN b
),
c AS (
  SELECT bucket,
         CAST(SUM(is_train) + 1 AS BIGINT) AS a,
         CAST(SUM(1 - is_train) + 1 AS BIGINT) AS h
  FROM bucketed GROUP BY bucket
),
t AS (SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(h) AS BIGINT) AS th
      FROM c)
SELECT c.bucket,
       GREATEST((1000000 * c.a) // t.ta, 1) AS train_ppm,
       GREATEST((1000000 * c.h) // t.th, 1) AS held_ppm,
       CAST((GREATEST((1000000 * c.a) // t.ta, 1)
             - GREATEST((1000000 * c.h) // t.th, 1))
            * CAST(floor(1000000.0 * ln(
                CAST(GREATEST((1000000 * c.a) // t.ta, 1) AS DOUBLE) /
                GREATEST((1000000 * c.h) // t.th, 1))) AS BIGINT)
            AS BIGINT) AS psi_contrib
FROM c CROSS JOIN t
""",
    doc="Population Stability Index between the train and held-out "
    "splits — the standard ML-ops drift check that a split (or a new "
    "data batch vs the training distribution) hasn't shifted: "
    "Σ (p_a − p_b)·ln(p_a/p_b) over 10 equal-width feature buckets, "
    "computed entirely in integers — shares in floor-div ppm with "
    "add-one smoothing, clamped to >= 1 ppm so an extreme-skew bucket "
    "can never push ln to 0's pole, one ln per BUCKET floored to "
    "micro-nats (the BM25/unigram precedent), so per-bucket "
    "contributions (1e-12 units) hash identically on both engines. Two scans (bounds, "
    "then bucket counts), a 10-row aggregate, and one-row broadcasts "
    "for the bounds and totals — at 100 TB the cost is the one "
    "bucketing pass; PSI > 0.2 is the conventional "
    "retrain/investigate trigger.",
)
def dq_psi_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    s = d.select(
        "n_chars",
        F.when(
            sampling.hash_bucket(F.col("doc_id"), "split") < 8000, 1
        ).otherwise(0).alias("is_train"),
    )
    b = s.agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
    bucketed = s.crossJoin(F.broadcast(b)).select(
        "is_train",
        F.least(
            F.expr("((n_chars - lo) * 10) div (hi - lo + 1)"),
            F.lit(9).cast("long"),
        ).alias("bucket"),
    )
    c = bucketed.groupBy("bucket").agg(
        (F.sum("is_train") + 1).cast("long").alias("a"),
        (F.sum(1 - F.col("is_train")) + 1).cast("long").alias("h"),
    )
    t = c.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("h").cast("long").alias("th"),
    )
    # Clamp shares to >= 1 ppm: at very large totals a near-empty
    # bucket's floor-divided share is 0 even after add-one smoothing,
    # and ln(0) hard-errors in DuckDB / NULLs in Spark — exactly on
    # the skewed inputs PSI exists to flag. 1 ppm is the resolution
    # floor of the share unit.
    out = c.crossJoin(F.broadcast(t)).select(
        "bucket",
        F.greatest(F.expr("(1000000 * a) div ta"), F.lit(1).cast("long"))
        .alias("train_ppm"),
        F.greatest(F.expr("(1000000 * h) div th"), F.lit(1).cast("long"))
        .alias("held_ppm"),
    )
    ln_ratio = F.floor(
        F.lit(1000000.0)
        * F.log(
            F.col("train_ppm").cast("double") / F.col("held_ppm")
        )
    ).cast("long")
    return out.select(
        "bucket",
        "train_ppm",
        "held_ppm",
        ((F.col("train_ppm") - F.col("held_ppm")) * ln_ratio)
        .cast("long")
        .alias("psi_contrib"),
    )


@register(
    "dq_snapshot_diff",
    oracle="""
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
delta AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) + 1
              ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 97 != 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_orderstatus,
         CAST(round(o_totalprice * 100, 0) AS BIGINT)
  FROM orders WHERE o_orderkey % 11 = 0
),
j AS (
  SELECT COALESCE(b.k, d.k) AS k,
         b.k IS NOT NULL AS in_base, d.k IS NOT NULL AS in_delta,
         b.st AS b_st, d.st AS d_st, b.cents AS b_c, d.cents AS d_c
  FROM base b FULL OUTER JOIN delta d ON b.k = d.k
)
SELECT
  CAST(SUM(CASE WHEN NOT in_base THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
  CAST(SUM(CASE WHEN NOT in_delta THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  CAST(SUM(CASE WHEN in_base AND in_delta
                 AND (b_st IS DISTINCT FROM d_st
                      OR b_c IS DISTINCT FROM d_c) THEN 1 ELSE 0 END)
       AS BIGINT) AS n_changed,
  CAST(SUM(CASE WHEN in_base AND in_delta
                 AND b_st IS NOT DISTINCT FROM d_st
                 AND b_c IS NOT DISTINCT FROM d_c THEN 1 ELSE 0 END)
       AS BIGINT) AS n_unchanged,
  CAST(SUM(CASE WHEN in_base AND in_delta
                 AND b_c IS DISTINCT FROM d_c THEN 1 ELSE 0 END)
       AS BIGINT) AS n_price_changed,
  CAST(SUM(CASE WHEN in_base AND in_delta
                 AND b_st IS DISTINCT FROM d_st THEN 1 ELSE 0 END)
       AS BIGINT) AS n_status_changed
FROM j
""",
    doc="Snapshot diff — the data-diff audit every migration, backfill "
    "or pipeline-upgrade review runs before swapping a table: one "
    "full-outer join on the key classifies every row as added / "
    "removed / changed / unchanged and attributes changes per column, "
    "collapsing to a single audit row. Money compares in integer "
    "cents (engine-exact); the delta here is a deterministic "
    "synthetic mutation set (drops, +1-cent edits, inserts) so the "
    "oracle reproduces the exact counts. Plan shape: ONE shuffle for "
    "the full-outer join, then a map-side-combined scalar aggregate; "
    "at 100 TB the join keys on the table's natural/bucketed key and "
    "a column-pruned comparison set keeps the shuffle narrow — the "
    "fingerprint manifest (write_with_manifest) answers the cheaper "
    "'identical or not' question without any join at all.",
)
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        cents.alias("cents"),
    )
    delta = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("st"),
            F.when(F.col("o_orderkey") % 5 == 0, cents + 1)
            .otherwise(cents)
            .alias("cents"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 11 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("k"),
                F.col("o_orderstatus").alias("st"),
                cents.alias("cents"),
            )
        )
    )
    # Membership must come from an explicit presence flag, NOT from a
    # value column's null-ness: a row whose status is legitimately
    # NULL is still IN the snapshot (null_fuzz_sweep's catch).
    b = base.select(
        F.col("k"), F.col("st").alias("b_st"), F.col("cents").alias("b_c"),
        F.lit(True).alias("_in_b"),
    )
    d = delta.select(
        F.col("k"), F.col("st").alias("d_st"), F.col("cents").alias("d_c"),
        F.lit(True).alias("_in_d"),
    )
    j = b.join(d, "k", "full_outer").select(
        F.coalesce(F.col("_in_b"), F.lit(False)).alias("in_base"),
        F.coalesce(F.col("_in_d"), F.lit(False)).alias("in_delta"),
        "b_st", "d_st", "b_c", "d_c",
    )
    both = F.col("in_base") & F.col("in_delta")
    # IS DISTINCT FROM, not != — a null->value transition IS a change
    # and null == null IS unchanged; plain != counts such rows as
    # NEITHER under three-valued logic.
    chg = ~F.col("b_st").eqNullSafe(F.col("d_st")) | ~F.col(
        "b_c"
    ).eqNullSafe(F.col("d_c"))
    one = F.lit(1)
    zero = F.lit(0)
    return j.agg(
        F.sum(F.when(~F.col("in_base"), one).otherwise(zero))
        .cast("long").alias("n_added"),
        F.sum(F.when(~F.col("in_delta"), one).otherwise(zero))
        .cast("long").alias("n_removed"),
        F.sum(F.when(both & chg, one).otherwise(zero))
        .cast("long").alias("n_changed"),
        F.sum(F.when(both & ~chg, one).otherwise(zero))
        .cast("long").alias("n_unchanged"),
        F.sum(
            F.when(both & ~F.col("b_c").eqNullSafe(F.col("d_c")), one)
            .otherwise(zero)
        ).cast("long").alias("n_price_changed"),
        F.sum(
            F.when(both & ~F.col("b_st").eqNullSafe(F.col("d_st")), one)
            .otherwise(zero)
        ).cast("long").alias("n_status_changed"),
    )


@register(
    "ts_cusum_alerts",
    oracle="""
WITH RECURSIVE d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
o AS (
  SELECT event_type, day, cnt,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS nd,
         SUM(cnt) OVER (PARTITION BY event_type) AS tot
  FROM d
),
p AS (
  SELECT event_type, day, cnt, i, (1000000 * tot) // nd AS mean_micro
  FROM o
),
r AS (
  SELECT event_type, day, cnt, i, mean_micro,
         CAST(GREATEST(CAST(0 AS BIGINT),
                  1000000 * cnt - mean_micro - mean_micro // 16)
              AS BIGINT) AS cusum
  FROM p WHERE i = 1
  UNION ALL
  SELECT p.event_type, p.day, p.cnt, p.i, p.mean_micro,
         CAST(GREATEST(CAST(0 AS BIGINT),
                  r.cusum + 1000000 * p.cnt - p.mean_micro
                  - p.mean_micro // 16) AS BIGINT)
  FROM p JOIN r ON p.event_type IS NOT DISTINCT FROM r.event_type
              AND p.i = r.i + 1
)
SELECT event_type, day, cnt, CAST(cusum AS BIGINT) AS cusum,
       cusum > mean_micro // 4 AS is_alert
FROM r
""",
    doc="CUSUM change detection on daily event volumes — the drift "
    "alarm a data-quality monitor runs over arrival counts: per "
    "series, CUSUM_t = max(0, CUSUM_{t-1} + (x_t - mean - slack)), "
    "alert when the accumulated positive drift crosses the threshold. "
    "The recurrence is genuinely SEQUENTIAL state — not window-"
    "expressible — and the engine runs it as a BOUNDED ARRAY FOLD in "
    "pure Catalyst: each series' (day, cnt) rows collect into one "
    "sorted array (days-per-series is bounded by the calendar, the "
    "same bound streaming state relies on), one aggregate() fold "
    "threads the accumulator through in order, and the result "
    "explodes back to rows. Everything is integer micro-units "
    "(mean = 1e6·total div n_days; slack mean/16; threshold mean/4) "
    "so the fold is BIGINT-exact against the oracle's recursive CTE. "
    "One exchange on the series key; at 100 TB the daily pre-"
    "aggregate is the only fact-scale pass.",
)
def ts_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull()  # timeless rows are outside event time
    )
    d = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("cnt").alias("tot"),
        F.sort_array(F.collect_list(F.struct("day", "cnt"))).alias("days"),
    ).select(
        "event_type",
        "days",
        F.expr("(1000000 * tot) div nd").alias("mean_micro"),
    )
    zero = F.lit(0).cast("long")
    mean = F.col("mean_micro")
    slack = F.expr("mean_micro div 16")
    init = F.expr(
        "CAST(array() AS array<struct<day: date, cnt: bigint, cusum: bigint>>)"
    )
    folded = F.aggregate(
        F.col("days"),
        init,
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.struct(
                    x["day"].alias("day"),
                    x["cnt"].alias("cnt"),
                    F.greatest(
                        zero,
                        F.coalesce(F.try_element_at(acc, F.lit(-1))["cusum"], zero)
                        + x["cnt"] * 1000000
                        - mean
                        - slack,
                    ).alias("cusum"),
                )
            ),
        ),
    )
    return (
        per.select(
            "event_type",
            "mean_micro",
            F.explode(folded).alias("r"),
        )
        .select(
            "event_type",
            F.col("r.day").alias("day"),
            F.col("r.cnt").alias("cnt"),
            F.col("r.cusum").alias("cusum"),
            (F.col("r.cusum") > F.expr("mean_micro div 4")).alias(
                "is_alert"
            ),
        )
    )


@register(
    "dq_winsorize",
    oracle="""
WITH c AS (
  SELECT o_orderpriority AS grp, o_orderkey,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE o_totalprice IS NOT NULL
),
r AS (
  SELECT grp, o_orderkey, cents,
         ROW_NUMBER() OVER (PARTITION BY grp
                            ORDER BY cents, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM c
),
bounds AS (
  SELECT grp,
         MAX(CASE WHEN rn = (n - 1) // 100 + 1 THEN cents END) AS lo,
         MAX(CASE WHEN rn = (99 * (n - 1)) // 100 + 1 THEN cents END) AS hi
  FROM r GROUP BY grp
)
SELECT r.grp,
       CAST(COUNT(*) AS BIGINT) AS n,
       b.lo, b.hi,
       CAST(SUM(r.cents) AS BIGINT) AS sum_cents,
       CAST(SUM(LEAST(GREATEST(r.cents, b.lo), b.hi)) AS BIGINT)
         AS sum_winsorized,
       CAST(SUM(CASE WHEN r.cents < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_low,
       CAST(SUM(CASE WHEN r.cents > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_high
FROM r JOIN bounds b USING (grp)
GROUP BY r.grp, b.lo, b.hi
""",
    doc="Winsorization — the outlier-clamping cleaning pass feature "
    "pipelines run before training: per-group p01/p99 bounds as EXACT "
    "integer ORDER STATISTICS (rank floor((q)(n-1))+1 over a "
    "deterministic (value, key) order — a selection, never an "
    "interpolation, so bounds and clamped sums are BIGINT-exact on "
    "both engines; the a13 exact-percentile entry documents "
    "approx_percentile as the at-scale swap for the rank pass). One "
    "window exchange on the group key; bounds collapse to one row "
    "per group and broadcast back; the audit rollup (totals + clamp "
    "counts per tail) is output-bounded by group count. Unpriced "
    "rows are excluded on both sides - a NULL cannot be ranked or "
    "clamped (null_fuzz_sweep).",
)
def dq_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    c = o.filter(F.col("o_totalprice").isNotNull()).select(
        F.col("o_orderpriority").alias("grp"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    w = Window.partitionBy("grp").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("grp")
    r = c.select(
        "grp",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = r.groupBy("grp").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n - 1) div 100 + 1"), F.col("cents"))
        ).alias("lo"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(99 * (n - 1)) div 100 + 1"),
                F.col("cents"),
            )
        ).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        r.join(F.broadcast(bounds), "grp")
        .groupBy("grp", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_cents"),
            F.sum(clamped).alias("sum_winsorized"),
            F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_low"),
            F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clamped_high"),
        )
        .select(
            "grp", "n", "lo", "hi", "sum_cents", "sum_winsorized",
            "n_clamped_low", "n_clamped_high",
        )
    )


@register(
    "samp_weighted_fixed_k",
    oracle="""
WITH u AS (
  SELECT doc_id, n_chars,
         (('0x' || substr(md5('aes|' || CAST(doc_id AS VARCHAR)), 1, 8))
            ::BIGINT % 1048576 + 1) / 1048576.0 AS uval
  FROM documents
  WHERE n_chars > 0
),
keyed AS (
  SELECT doc_id, n_chars,
         round(ln(uval) / n_chars, 12) AS skey
  FROM u
)
SELECT doc_id, n_chars FROM keyed
ORDER BY skey DESC, doc_id LIMIT 50
""",
    doc="EXACTLY-k weighted sampling without replacement (Efraimidis-"
    "Spirakis A-ES): each row draws u from its salted content hash "
    "(an exact binary fraction, engine-identical) and keys on "
    "ln(u)/w; the k largest keys are a weight-proportional fixed-"
    "size sample. Completes the sampling family's matrix — PPS is "
    "weighted but Bernoulli (random size), global_fixed is exactly-k "
    "but unweighted; this is both. Deterministic and partition-"
    "invariant like every membership rule here; the single float op "
    "(one ln per row) rounds to 1e-12 before ranking so a last-ulp "
    "libm difference can't move the k-boundary, with doc_id as the "
    "tie-break. Plans as TakeOrderedAndProject over a narrow scan — "
    "no shuffle, no window, no global sort.",
)
def samp_weighted_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents", heal=False)["documents"]
    u = (
        textops.portable_hash32(
            F.concat_ws("|", F.lit("aes"), F.col("doc_id").cast("string"))
        )
        % 1048576
        + 1
    ) / F.lit(1048576.0)
    skey = F.round(F.log(u) / F.col("n_chars"), 12)
    return (
        d.filter(F.col("n_chars") > 0)
        .select("doc_id", "n_chars", skey.alias("_s"))
        .orderBy(F.desc("_s"), "doc_id")
        .limit(50)
        .select("doc_id", "n_chars")
    )


@register(
    "attrib_multi_model",
    oracle="""
WITH pairs AS (
  SELECT p.event_id AS pid,
         CAST(round(p.value * 100, 0) AS BIGINT) AS cents,
         c.ts AS click_ts, c.event_id AS cid
  FROM events p
  JOIN events c
    ON p.event_type = 'purchase' AND c.event_type = 'click'
   AND c.user_id = p.user_id
   AND c.ts >= p.ts - INTERVAL 60 MINUTES AND c.ts < p.ts
),
credited AS (
  SELECT pid, cents, click_ts,
         ROW_NUMBER() OVER (PARTITION BY pid
                            ORDER BY click_ts, cid) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY pid
                            ORDER BY click_ts DESC, cid DESC) AS rn_last,
         COUNT(*) OVER (PARTITION BY pid) AS n_touch
  FROM pairs
)
SELECT strftime(date_trunc('hour', click_ts), '%Y-%m-%d %H:%M:%S')
         AS click_hour,
       CAST(SUM(CASE WHEN rn_first = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS first_touch_cents,
       CAST(SUM(CASE WHEN rn_last = 1 THEN cents ELSE 0 END) AS BIGINT)
         AS last_touch_cents,
       CAST(SUM((cents * 1000000) // n_touch) AS BIGINT)
         AS linear_micro_cents
FROM credited
GROUP BY 1
""",
    doc="Multi-touch attribution, three models in one pass: each "
    "purchase's prior-hour clicks share its value by FIRST-touch "
    "(all credit to the earliest click), LAST-touch (to the latest), "
    "and LINEAR (cents x 1e6 // n per click — integer micro-cents "
    "with truncating division, so per-model totals are engine-exact; "
    "a production job reconciles the <=n_touch-1 micro-cent "
    "truncation residue to the first touch as policy). One interval "
    "self-join bounded by the 60-minute window (the streaming twin's "
    "state bound), then per-purchase windows share a single exchange "
    "on the purchase id; the hourly rollup is output-bounded. "
    "Deterministic tie-breaks by (ts, event_id).",
)
def attrib_multi_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    pairs = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") >= F.col("p_ts") - F.expr("INTERVAL 60 MINUTES"))
        & (F.col("click_ts") < F.col("p_ts")),
    )
    wf = Window.partitionBy("pid").orderBy("click_ts", "cid")
    wl = Window.partitionBy("pid").orderBy(
        F.desc("click_ts"), F.desc("cid")
    )
    wn = Window.partitionBy("pid")
    credited = pairs.select(
        "pid",
        "cents",
        "click_ts",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        F.count(F.lit(1)).over(wn).alias("n_touch"),
    )
    return credited.groupBy(
        F.date_format(
            F.date_trunc("hour", "click_ts"), "yyyy-MM-dd HH:mm:ss"
        ).alias("click_hour")
    ).agg(
        F.sum(
            F.when(F.col("rn_first") == 1, F.col("cents")).otherwise(0)
        ).alias("first_touch_cents"),
        F.sum(
            F.when(F.col("rn_last") == 1, F.col("cents")).otherwise(0)
        ).alias("last_touch_cents"),
        F.sum(F.expr("(cents * 1000000) div n_touch")).alias(
            "linear_micro_cents"
        ),
    )


@register(
    "ts_interpolate_hourly",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
),
spine AS (
  SELECT b.event_type, unnest(generate_series(b.h0, b.h1)) AS h FROM bounds b
),
j AS (
  SELECT s.event_type, s.h, d.cents
  FROM spine s LEFT JOIN hourly d
    ON d.event_type = s.event_type AND d.h = s.h
),
n AS (
  SELECT event_type, h, cents,
         last_value(cents IGNORE NULLS) OVER w AS pc,
         last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
           OVER w AS ph,
         first_value(cents IGNORE NULLS) OVER w2 AS nc,
         first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
           OVER w2 AS nh
  FROM j
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS UNBOUNDED PRECEDING),
         w2 AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, h,
       CASE WHEN cents IS NOT NULL THEN cents
            ELSE pc + ((nc - pc) * (h - ph)) // (nh - ph) END AS cents,
       cents IS NULL AS is_interpolated
FROM n
""",
    doc="Grouped time-series LINEAR interpolation at hourly grain: the "
    "gap-filling completion of the family (ts_gapfill_daily zero-"
    "fills, w8_forward_fill carries last-known): missing hours get "
    "prev + (next-prev)*(h-prev_h)/(next_h-prev_h) in integer cents "
    "with truncating integer division — Spark's div and DuckDB's // "
    "agree on negative slopes too, so interpolated values are "
    "engine-exact with zero float arithmetic. One exchange on "
    "event_type: the spine explodes from per-series bounds, and "
    "prev/next anchors come from two IGNORE NULLS window passes over "
    "the same partitioning (no self-join). Series boundaries are "
    "always observed rows by construction, so no edge NULLs.",
)
def ts_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    hourly = e.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("h"),
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    j = spine.join(hourly, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = F.when(F.col("cents").isNotNull(), F.col("h"))
    n = j.select(
        "event_type",
        "h",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("pc"),
        F.last(marked, ignorenulls=True).over(wp).alias("ph"),
        F.first("cents", ignorenulls=True).over(wn).alias("nc"),
        F.first(marked, ignorenulls=True).over(wn).alias("nh"),
    )
    interp = F.col("pc") + F.expr("((nc - pc) * (h - ph)) div (nh - ph)")
    return n.select(
        "event_type",
        "h",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(interp)
        .alias("cents"),
        F.col("cents").isNull().alias("is_interpolated"),
    )


@register(
    "path_top_trigrams",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, event_type, ts, epoch_us(ts) AS us
  FROM events
),
s AS (
  SELECT *,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM o
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT *,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM s
),
p AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER w2 AS e2,
         lead(event_type, 2) OVER w2 AS e3,
         sess,
         lead(sess, 1) OVER w2 AS s2,
         lead(sess, 2) OVER w2 AS s3
  FROM g
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT coalesce(e1, '') || '>' || coalesce(e2, '')
       || '>' || coalesce(e3, '') AS path,
       CAST(count(*) AS BIGINT) AS n_paths
FROM p WHERE s2 = sess AND s3 = sess
GROUP BY 1 ORDER BY n_paths DESC, path LIMIT 10
""",
    doc="Session path analysis: the 10 most common 3-event event-type "
    "sequences inside 30-minute-gap user sessions — the 'how do users "
    "actually move through the product' query behind every funnel "
    "redesign. Single-exchange shape: sessionization (gap flag + "
    "running sum) AND the trigram leads all run in windows partitioned "
    "by user_id alone — session membership of the lead rows is checked "
    "by leading the session id itself (s2/s3 = sess), so no second "
    "window partitioned by (user, session) and no second exchange. "
    "The trailing aggregate's input is one row per event; output is "
    "vocabulary³-bounded. Deterministic: event order is (ts, event_id) "
    "and the frame is explicit ROWS.",
)
def path_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros("ts")
    brk = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > 1800000000),
        1,
    ).otherwise(0)
    g = e.select("user_id", "event_id", "event_type", "ts").withColumn(
        "sess", F.sum(brk).over(wr)
    )
    p = g.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        "sess",
        F.lead("sess", 1).over(w).alias("s2"),
        F.lead("sess", 2).over(w).alias("s3"),
    )
    return (
        p.filter((F.col("s2") == F.col("sess")) & (F.col("s3") == F.col("sess")))
        .select(
            # coalesce('') per step: concat_ws SKIPS a NULL step
            # (collapsing the trigram) while SQL || nulls the whole
            # path — pin the canonical '' form (null_fuzz_sweep).
            F.concat_ws(
                ">",
                F.coalesce(F.col("e1"), F.lit("")),
                F.coalesce(F.col("e2"), F.lit("")),
                F.coalesce(F.col("e3"), F.lit("")),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "path")
        .limit(10)
    )


@register(
    "dq_key_skew_report",
    oracle="""
WITH stacked AS (
  SELECT 'l_orderkey' AS key_col, l_orderkey AS key_value FROM lineitem
  UNION ALL
  SELECT 'l_partkey', l_partkey FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', l_suppkey FROM lineitem
),
counts AS (
  SELECT key_col, key_value, CAST(count(*) AS BIGINT) AS n_rows
  FROM stacked GROUP BY 1, 2
),
tot AS (SELECT key_col, CAST(sum(n_rows) AS BIGINT) AS total
        FROM counts GROUP BY 1),
ranked AS (
  SELECT key_col, key_value, n_rows,
         ROW_NUMBER() OVER (PARTITION BY key_col
                            ORDER BY n_rows DESC, key_value) AS rn
  FROM counts
)
SELECT r.key_col, r.key_value, r.n_rows, CAST(r.rn AS INT) AS rank,
       (1000000 * r.n_rows) // t.total AS share_ppm
FROM ranked r JOIN tot t USING (key_col)
WHERE r.rn <= 5
""",
    doc="Join-key skew diagnosis — the 'measure before you salt' "
    "report every 100 TB join plan should start from: for each "
    "candidate shuffle key, the 5 heaviest values with their row "
    "counts and integer parts-per-million share of the table. One "
    "stacked pass (the three key columns unpivot map-side, so the "
    "fact scans ONCE), one combined groupBy, then a top-5 window on "
    "the (small) per-key counts. share_ppm is integer floor division "
    "— engine-exact. The output feeds the existing knobs directly: "
    "a key above the salt threshold routes to skew_salted_join, a "
    "bucket/shingle above its cap routes to the cap-and-drop fuses.",
)
def dq_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    stacked = li.select(
        F.expr(
            "stack(3, 'l_orderkey', l_orderkey, 'l_partkey', l_partkey, "
            "'l_suppkey', l_suppkey) AS (key_col, key_value)"
        )
    )
    counts = stacked.groupBy("key_col", "key_value").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = counts.groupBy("key_col").agg(F.sum("n_rows").alias("total"))
    w = Window.partitionBy("key_col").orderBy(
        F.desc("n_rows"), F.asc("key_value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .join(F.broadcast(tot), "key_col")
        .select(
            "key_col",
            "key_value",
            "n_rows",
            "rank",
            F.expr("(1000000 * n_rows) div total").alias("share_ppm"),
        )
    )


# Shared CTE for the bounded-degree item graph: each item's top-5
# co-occurring neighbors (by shared-user support, ties to smaller id),
# then symmetrized into an undirected (a < b) edge set. The top-k cap
# is the scale fuse: degree is bounded by 2k regardless of how dense
# the raw co-occurrence gets (at sf0.001 the raw graph is a near-
# clique — 4,897 of 4,950 possible pairs), so the wedge join below is
# O(V * k^2), not O(V^3).
_KNN_EDGES_SQL = """
ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract(props, '$.k') IS NOT NULL
),
co AS (
  SELECT a.item AS src, b.item AS dst,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item != b.item
  GROUP BY 1, 2
),
knn AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY n_users DESC, dst) AS rn
    FROM co
  ) WHERE rn <= 5
),
edges AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM knn
)
""".strip()


def _knn_edges(spark: SparkSession, sf_dir: str):
    """Engine-side twin of :data:`_KNN_EDGES_SQL` — the SINGLE
    construction of the capped undirected item graph, shared by
    graph_triangles, graph_link_prediction, graph_label_propagation,
    and graph_modularity so the degree cap and tie-break can never
    desynchronize across the four entries (they previously carried
    four copies). Returns (directed_knn, undirected_edges), the
    undirected side persisted (every caller joins it at least
    twice)."""
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    ui = (
        e.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    a = ui.select("user_id", F.col("item").alias("src"))
    b = ui.select("user_id", F.col("item").alias("dst"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("n_users"), F.asc("dst"))
    knn = (
        co.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("src", "dst")
    )
    edges = (
        knn.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    return knn, edges


@register(
    "graph_triangles",
    oracle=f"""
WITH {_KNN_EDGES_SQL},
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM edges e1
  JOIN edges e2 ON e2.a = e1.b
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT a AS item FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT item, CAST(count(*) AS BIGINT) AS n_triangles
FROM corners GROUP BY item
""",
    doc="Distributed triangle counting over the bounded-degree item "
    "graph (top-5 co-occurrence neighbors per item, symmetrized to "
    "an undirected a<b edge list) — the third graph-family member "
    "beyond connected components and PageRank, and the standard "
    "cohesion feature for community detection and spam/bot audits. "
    "The id-ordered orientation (a<b<c via two ordered hash joins + "
    "a closing-edge join) enumerates each triangle exactly once with "
    "no candidate explosion; per-corner participation counts come "
    "from a union of three projections of the (a,b,c) triple, one "
    "map-side-combined aggregate. At 100 TB: the top-k cap bounds "
    "every join's fan-out at k^2 per vertex, all three joins shuffle "
    "only (BIGINT, BIGINT) pairs, and the raw co-occurrence density "
    "never reaches the wedge join (the cap is applied per-src before "
    "symmetrization, same as graph_pagerank_items).",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    _knn, edges = _knn_edges(spark, sf_dir)
    e1 = edges
    e2 = edges.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = edges.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (
        e1.join(e2, "b")
        .join(
            e3,
            (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
        )
        .select("a", "b", "c")
    )
    corners = (
        tri.select(F.col("a").alias("item"))
        .union(tri.select(F.col("b").alias("item")))
        .union(tri.select(F.col("c").alias("item")))
    )
    return corners.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


@register(
    "ts_max_concurrency",
    oracle="""
WITH iv AS (
  SELECT event_type, ts AS s, ts + INTERVAL 15 MINUTE AS e FROM events
),
deltas AS (
  SELECT event_type, s AS t, CAST(1 AS BIGINT) AS d FROM iv
  UNION ALL
  SELECT event_type, e AS t, CAST(-1 AS BIGINT) AS d FROM iv
),
running AS (
  SELECT event_type, t, d,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS conc
  FROM deltas
),
peak AS (
  SELECT event_type, max(conc) AS peak_concurrency
  FROM running GROUP BY event_type
)
SELECT r.event_type,
       CAST(p.peak_concurrency AS BIGINT) AS peak_concurrency,
       min(r.t) AS first_peak_ts
FROM running r JOIN peak p
  ON r.event_type = p.event_type AND r.conc = p.peak_concurrency
GROUP BY r.event_type, p.peak_concurrency
""",
    doc="Sweep-line peak concurrency per event type: every event "
    "opens a 15-minute dwell interval [ts, ts+15m); +1/-1 boundary "
    "deltas, a running sum ordered by (t, d), and the max is the "
    "peak number of simultaneously-open intervals — the classic "
    "interval-overlap aggregation behind capacity planning and "
    "session-concurrency dashboards. Determinism under ties is "
    "argued, not assumed: rows tying on the sort key (t, d) all "
    "carry the SAME delta, so the multiset of running-sum values "
    "inside a tie group is permutation-invariant — max and "
    "first-peak-ts are well-defined on both engines even though "
    "neither promises a stable sort. Ordering d ascending puts -1 "
    "closes before +1 opens at the same instant (end-exclusive "
    "semantics). Plan: one exchange on event_type feeds the "
    "running-sum sort, the 5-row peak table broadcasts back, and "
    "the final aggregate reuses the same partitioning — at 100 TB "
    "the per-key sort is the cost, which is exactly the sweep "
    "line's sequential nature; finer sharding (e.g. per day with "
    "boundary stitching) is the documented scale-out.",
)
def ts_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    iv = e.select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
    )
    deltas = iv.select(
        "event_type", F.col("s").alias("t"), F.lit(1).cast("long").alias("d")
    ).union(
        iv.select(
            "event_type",
            F.col("e").alias("t"),
            F.lit(-1).cast("long").alias("d"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.select(
        "event_type", "t", F.sum("d").over(w).alias("conc")
    )
    peak = running.groupBy("event_type").agg(
        F.max("conc").alias("peak_concurrency")
    )
    return (
        running.join(F.broadcast(peak), "event_type")
        .filter(F.col("conc") == F.col("peak_concurrency"))
        .groupBy("event_type", "peak_concurrency")
        .agg(F.min("t").alias("first_peak_ts"))
        .select("event_type", "peak_concurrency", "first_peak_ts")
    )


@register(
    "w13_rolling_median",
    oracle="""
WITH daily AS (
  SELECT o_orderpriority,
         epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS c
  FROM orders
  WHERE o_totalprice IS NOT NULL
  GROUP BY 1, 2
),
rolled AS (
  SELECT o_orderpriority, day, c,
         list_sort(list(c) OVER (
           PARTITION BY o_orderpriority ORDER BY day NULLS FIRST
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS win
  FROM daily
)
SELECT o_orderpriority, day, c,
       CAST(len(win) AS BIGINT) AS n_win,
       CAST(CASE WHEN len(win) % 2 = 1
                 THEN 2 * win[(len(win) + 1) // 2]
                 ELSE win[len(win) // 2] + win[len(win) // 2 + 1]
            END AS BIGINT) AS med_x2
FROM rolled
""",
    doc="EXACT rolling median (7-day, ROWS frame) of daily revenue "
    "per order priority — the robust smoother dashboards want where "
    "a rolling mean is wrecked by one spiky day. Neither engine "
    "supports exact percentile as a window aggregate, so the frame "
    "is materialized: collect_list/list() over ROWS BETWEEN 6 "
    "PRECEDING, sorted, and the median read by index — reported as "
    "med_x2 (double the median) so the even-count midpoint average "
    "stays in BIGINT, no float division on either engine. The frame "
    "is BOUNDED (7 values of daily pre-aggregates), so the "
    "materialized list is O(1) per row and the whole window rides "
    "the single (priority) exchange the daily rollup already "
    "created; the day key is integer epoch-day floor-division "
    "(nonnegative: div == //). At 100 TB the daily pre-aggregation "
    "is what shrinks the input — the window runs over O(groups x "
    "days) rows, not the fact. approx_percentile over a raw-row "
    "RANGE frame is the documented swap when the frame cannot be "
    "pre-aggregated. Unpriced rows are excluded on both sides and "
    "a NULL day sorts FIRST, pinned in the oracle (null_fuzz_sweep).",
)
def w13_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    daily = (
        o.filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_orderpriority",
            F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("o_orderpriority", "day")
        .agg(F.sum("cents").alias("c"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    rolled = daily.select(
        "o_orderpriority",
        "day",
        "c",
        F.sort_array(F.collect_list("c").over(w)).alias("win"),
    )
    n = F.size("win")
    med_x2 = (
        F.when(
            n % 2 == 1,
            2 * F.element_at("win", ((n + 1) / 2).cast("int")),
        )
        .otherwise(
            F.element_at("win", (n / 2).cast("int"))
            + F.element_at("win", (n / 2 + 1).cast("int"))
        )
        .cast("long")
    )
    return rolled.select(
        "o_orderpriority",
        "day",
        "c",
        n.cast("long").alias("n_win"),
        med_x2.alias("med_x2"),
    )


@register(
    "dq_mad_outliers",
    oracle="""
WITH cents AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c
  FROM lineitem
),
med AS (
  SELECT l_returnflag,
         CAST(median(2 * c) AS BIGINT) AS med_x2
  FROM cents GROUP BY l_returnflag
),
dev AS (
  SELECT c.l_returnflag, abs(2 * c.c - m.med_x2) AS d, m.med_x2
  FROM cents c JOIN med m USING (l_returnflag)
),
mad AS (
  SELECT l_returnflag, CAST(median(2 * d) AS BIGINT) AS mad_x4
  FROM dev GROUP BY l_returnflag
)
SELECT d.l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       min(d.med_x2) AS med_x2,
       min(m.mad_x4) AS mad_x4,
       CAST(sum(CASE WHEN 2 * d.d > 3 * m.mad_x4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_out_3mad
FROM dev d JOIN mad m USING (l_returnflag)
GROUP BY d.l_returnflag
""",
    doc="Robust outlier detection by median absolute deviation, "
    "integer-exact end to end: the median and the MAD are reported "
    "in doubled units (med_x2, mad_x4) so the even-count midpoint "
    "average of integers stays integral — 2x cents has even values, "
    "so the interpolated median is an exact BIGINT on both engines; "
    "likewise the MAD over the (already doubled, hence integer) "
    "absolute deviations. The 3-MAD flag |x-med| > 3*MAD cross-"
    "multiplies to 2*dev > 3*mad_x4 — no float compare anywhere, "
    "unlike every textbook 1.4826*MAD formulation. Complements "
    "dq_zscore_outliers: MAD survives the exact heavy-tail "
    "contamination that inflates sigma and hides outliers from the "
    "z-score. Plan: two exact-percentile aggregates over the 3-group "
    "key with the tiny group tables broadcast back between passes — "
    "exact per-group percentiles sort within groups (the documented "
    "cost, same as a13_median_percentile); approx_percentile is the "
    "at-scale swap when 3 sorted passes over the fact are too dear.",
)
def dq_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("c"),
    )
    med = cents.groupBy("l_returnflag").agg(
        F.percentile(2 * F.col("c"), F.lit(0.5)).cast("long").alias("med_x2")
    )
    dev = cents.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag",
        F.abs(2 * F.col("c") - F.col("med_x2")).alias("d"),
        "med_x2",
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.percentile(2 * F.col("d"), F.lit(0.5)).cast("long").alias("mad_x4")
    )
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med_x2").alias("med_x2"),
            F.min("mad_x4").alias("mad_x4"),
            F.sum(
                F.when(2 * F.col("d") > 3 * F.col("mad_x4"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_out_3mad"),
        )
    )


@register(
    "ts_linear_trend",
    oracle="""
WITH daily AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
centered AS (
  SELECT event_type,
         day - min(day) OVER (PARTITION BY event_type) AS x,
         y
  FROM daily
),
sums AS (
  SELECT event_type,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM centered GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM sums
""",
    doc="Per-series OLS linear trend over daily event counts, "
    "reported as the EXACT RATIONAL slope (numerator n*Sxy - Sx*Sy, "
    "denominator n*Sxx - Sx^2) — the drift detector for monitoring "
    "volume trends without a single float: the caller divides (or "
    "cross-multiplies against a threshold) at the end. The day index "
    "is re-centered per series (x = day - min day, via a window min "
    "on the tiny daily rollup) so the moment sums stay small; they "
    "still ride in DECIMAL(38,0)/HUGEINT because n*Sxy is quadratic "
    "in the series length times daily volume at 100 TB. Outputs are "
    "BIGINT (oracle guard bans DECIMAL). Plan: one map-side-combined "
    "daily rollup shuffled on (type, day), then the window min and "
    "the moment aggregate share the per-type exchange over O(days) "
    "rows — the fact is touched once.",
)
def ts_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    centered = daily.select(
        "event_type",
        (
            F.col("day")
            - F.min("day").over(Window.partitionBy("event_type"))
        ).alias("x"),
        "y",
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    sums = centered.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
    )
    return sums.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("slope_den"),
    )


@register(
    "dq_category_entropy",
    oracle="""
WITH counts AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY lang, source
),
tot AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM counts GROUP BY lang
),
terms AS (
  SELECT c.lang, t.n, t.n_sources,
         c.c * CAST(floor(-ln(CAST(c.c AS DOUBLE) / t.n) * 1000000)
                    AS BIGINT) AS wterm
  FROM counts c JOIN tot t USING (lang)
)
SELECT lang, min(n) AS n_docs, min(n_sources) AS n_sources,
       CAST(sum(wterm) // min(n) AS BIGINT) AS entropy_micro_nats
FROM terms GROUP BY lang
""",
    doc="Shannon entropy of the source distribution per language, "
    "quantized to integer micro-nats — the class-balance / "
    "diversity audit a corpus pipeline runs before mixing: entropy "
    "near 0 means one source dominates the language. Each "
    "category's -ln(c/N) is floored to micro-nats BEFORE the "
    "count-weighted sum (the unigram_logprob pattern: both engines "
    "compute the same double ratio and the same libm ln, and the "
    "floor quantization absorbs any final-ulp concern), then the "
    "weighted sum divides by N with integer div — every output "
    "column is BIGINT. Plan: two map-side-combined aggregates over "
    "the (lang, source) key — cardinality O(langs x sources), never "
    "O(rows) — with the per-lang totals joined back broadcast; the "
    "documents fact is scanned once, text column pruned away.",
)
def dq_category_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    counts = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = counts.groupBy("lang").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_sources")
    )
    terms = counts.join(F.broadcast(tot), "lang").select(
        "lang",
        "n",
        "n_sources",
        (
            F.col("c")
            * F.floor(
                -F.log(F.col("c").cast("double") / F.col("n")) * 1000000
            )
        ).alias("wterm"),
    )
    return terms.groupBy("lang").agg(
        F.min("n").alias("n_docs"),
        F.min("n_sources").alias("n_sources"),
        F.expr("CAST(sum(wterm) div min(n) AS BIGINT)").alias(
            "entropy_micro_nats"
        ),
    )


@register(
    "ts_seasonal_baseline",
    oracle="""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
),
wd AS (
  SELECT day % 7 AS weekday,
         CAST(sum(cnt) AS BIGINT) AS wd_sum,
         CAST(count(*) AS BIGINT) AS wd_n
  FROM daily GROUP BY 1
)
SELECT d.day, d.day % 7 AS weekday, d.cnt, w.wd_sum, w.wd_n
FROM daily d JOIN wd w ON d.day % 7 = w.weekday
WHERE 4 * d.cnt * w.wd_n > 5 * w.wd_sum
""",
    doc="Seasonal-baseline anomaly flags: each day's order count "
    "against the average over all SAME-WEEKDAY days, flagging days "
    ">= 25% above baseline via the cross-multiplied integer "
    "predicate 4*cnt*wd_n > 5*wd_sum — no float division, no "
    "averages materialized. The weekday key is epoch-day mod 7 — a "
    "pure-integer convention identical on every engine, sidestepping "
    "the dayofweek() numbering trap f8_calendar_features documents. "
    "Baseline is over OBSERVED days (absent days don't vote; gap-"
    "filling is ts_gapfill_daily's job and composes upstream of "
    "this). Plan: the fact collapses to O(days) in one map-side-"
    "combined aggregate; the 7-row weekday table broadcasts back — "
    "the flag pass is a broadcast hash join over the daily rollup, "
    "nothing re-shuffles.",
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    daily = (
        o.select(
            F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wd = (
        daily.select((F.col("day") % 7).alias("weekday"), "cnt")
        .groupBy("weekday")
        .agg(
            F.sum("cnt").alias("wd_sum"),
            F.count(F.lit(1)).alias("wd_n"),
        )
    )
    return (
        daily.withColumn("weekday", F.col("day") % 7)
        .join(F.broadcast(wd), "weekday")
        .filter(
            4 * F.col("cnt") * F.col("wd_n") > 5 * F.col("wd_sum")
        )
        .select("day", "weekday", "cnt", "wd_sum", "wd_n")
    )


@register(
    "text_collocation_pmi",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
uni AS (
  SELECT unnest(toks) AS w FROM tok
),
uc AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w
),
n_uni AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM uni),
bi AS (
  SELECT unnest(list_transform(
           range(1, len(toks)),
           i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM tok WHERE len(toks) >= 2
),
bc AS (
  SELECT string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2,
         CAST(count(*) AS BIGINT) AS c_ab
  FROM bi GROUP BY 1, 2
),
n_bi AS (SELECT CAST(sum(c_ab) AS BIGINT) AS np FROM bc)
SELECT w1, w2, c_ab,
       CAST(floor(ln(
         CAST(c_ab * nu * nu AS DOUBLE) /
         CAST(np * a.c * b.c AS DOUBLE)) * 1000000) AS BIGINT)
         AS pmi_micro
FROM bc
JOIN uc a ON bc.w1 = a.w
JOIN uc b ON bc.w2 = b.w
CROSS JOIN n_uni CROSS JOIN n_bi
WHERE c_ab >= 5
ORDER BY pmi_micro DESC, w1, w2
LIMIT 20
""",
    doc="Pointwise mutual information collocations: the top-20 "
    "adjacent word pairs that co-occur far more than their unigram "
    "frequencies predict — the phrase-mining signal (multi-word "
    "expressions, named entities) that raw bigram counts miss "
    "because they rank stopword pairs first. PMI = ln(P(ab) / "
    "P(a)P(b)) is computed as ONE ln over an exact integer rational "
    "(c_ab*N_uni^2 over N_pairs*c_a*c_b — both products BIGINT, "
    "int-to-double conversion identical on both engines), floored "
    "to micro-nats; the c_ab >= 5 support floor is the standard "
    "PMI-vs-noise fuse. Plan: bigram and unigram counts are two "
    "map-side-combined vocabulary-bounded aggregates; unigram "
    "counts join back onto the bigram table by word (vocabulary-"
    "sized hash join, never corpus-sized); the two scalar totals "
    "broadcast; top-20 is TakeOrderedAndProject.",
)
def text_collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    t = d.select(textops.tokens(F.col("text")).alias("toks"))
    uni = t.select(F.explode("toks").alias("w"))
    uc = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n_uni = uni.agg(F.count(F.lit(1)).alias("nu"))
    t2 = t.filter(F.size("toks") >= 2)
    n1 = F.size("toks") - 1
    bi = t2.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, n1),
                F.slice(F.col("toks"), 2, n1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram")
    )
    bc = (
        bi.select(
            F.split("bigram", " ").getItem(0).alias("w1"),
            F.split("bigram", " ").getItem(1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    n_bi = bc.agg(F.sum("c_ab").alias("np"))
    a = uc.select(F.col("w").alias("w1"), F.col("c").alias("ca"))
    b = uc.select(F.col("w").alias("w2"), F.col("c").alias("cb"))
    return (
        bc.filter(F.col("c_ab") >= 5)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.floor(
                F.log(
                    (F.col("c_ab") * F.col("nu") * F.col("nu")).cast(
                        "double"
                    )
                    / (F.col("np") * F.col("ca") * F.col("cb")).cast(
                        "double"
                    )
                )
                * 1000000
            )
            .cast("long")
            .alias("pmi_micro"),
        )
        .orderBy(F.desc("pmi_micro"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


@register(
    "w14_activity_streaks",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
numbered AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS grp
  FROM active
),
islands AS (
  SELECT user_id, grp,
         CAST(count(*) AS BIGINT) AS streak_len,
         min(day) AS streak_start
  FROM numbered GROUP BY user_id, grp
),
ranked AS (
  SELECT user_id, streak_len, streak_start,
         max(streak_len) OVER (PARTITION BY user_id) AS max_len,
         sum(streak_len) OVER (PARTITION BY user_id) AS n_active
  FROM islands
)
SELECT user_id,
       CAST(min(n_active) AS BIGINT) AS n_active_days,
       CAST(min(max_len) AS BIGINT) AS longest_streak,
       min(streak_start) AS streak_start_day
FROM ranked
WHERE streak_len = max_len
GROUP BY user_id
""",
    doc="Gaps-and-islands: per-user longest run of CONSECUTIVE active "
    "days (plus total active days and the earliest day a longest "
    "streak starts) — the classic engagement/retention metric and "
    "the canonical day - row_number() grouping trick: consecutive "
    "days share the (day - rn) island key with zero self-joins. All "
    "integer epoch-day arithmetic; ties between equal-length "
    "streaks resolve to the earliest start on both engines via the "
    "final MIN. Plan: the fact collapses to distinct (user, day) "
    "first (one map-side-combined exchange); the row_number, both "
    "full-frame window aggregates, and the final filter+aggregate "
    "all reuse that single per-user partitioning — one shuffle "
    "total, O(active-days) rows after the distinct.",
)
def w14_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    active = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    wn = Window.partitionBy("user_id").orderBy("day")
    numbered = active.select(
        "user_id",
        "day",
        (F.col("day") - F.row_number().over(wn)).alias("grp"),
    )
    islands = numbered.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("day").alias("streak_start"),
    )
    wu = Window.partitionBy("user_id")
    ranked = islands.select(
        "user_id",
        "streak_len",
        "streak_start",
        F.max("streak_len").over(wu).alias("max_len"),
        F.sum("streak_len").over(wu).alias("n_active"),
    )
    return (
        ranked.filter(F.col("streak_len") == F.col("max_len"))
        .groupBy("user_id")
        .agg(
            F.min("n_active").cast("long").alias("n_active_days"),
            F.min("max_len").cast("long").alias("longest_streak"),
            F.min("streak_start").alias("streak_start_day"),
        )
    )


@register(
    "reco_user_user_cf",
    oracle="""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract(props, '$.k') IS NOT NULL
),
item_pop AS (
  SELECT item, CAST(count(*) AS BIGINT) AS n_users
  FROM ui GROUP BY item
),
kept AS (
  SELECT u.user_id, u.item FROM ui u
  JOIN item_pop p ON u.item = p.item AND p.n_users <= 200
),
deg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS d FROM kept GROUP BY 1
),
pairs AS (
  SELECT a.user_id AS u1, b.user_id AS u2,
         CAST(count(*) AS BIGINT) AS shared
  FROM kept a JOIN kept b
    ON a.item = b.item AND a.user_id != b.user_id
  GROUP BY 1, 2
),
scored AS (
  SELECT p.u1, p.u2, p.shared,
         (1000000 * p.shared * p.shared) // (da.d * db.d) AS cos2_ppm
  FROM pairs p
  JOIN deg da ON p.u1 = da.user_id
  JOIN deg db ON p.u2 = db.user_id
)
SELECT u1, u2, shared, cos2_ppm
FROM (
  SELECT u1, u2, shared, cos2_ppm,
         row_number() OVER (PARTITION BY u1
                            ORDER BY cos2_ppm DESC, u2) AS rn
  FROM scored
) WHERE rn <= 3
""",
    doc="User-user collaborative filtering: each user's top-3 most "
    "similar users by SQUARED binary cosine in integer ppm — "
    "cos^2 = shared^2 / (|A||B|) is monotone in cosine, so the "
    "ranking is exactly the cosine ranking with zero sqrt and zero "
    "floats (BIGINT floor-division; (cos2_ppm DESC, u2) makes the "
    "cut deterministic). The neighbor lists drive user-based "
    "recommendation and sockpuppet/collusion detection. Scale "
    "fuses mirror reco_item_cooccurrence from the other side: "
    "items with > 200 distinct users are dropped BEFORE the self-"
    "join (ubiquitous items carry no similarity signal and are "
    "exactly the quadratic blowup), so per-item fan-out is capped; "
    "the join shuffles only (item, user) pairs; degree tables are "
    "user-vocabulary-sized hash joins; top-3 is one window on the "
    "pair table.",
)
def reco_user_user_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    ui = (
        e.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    item_pop = ui.groupBy("item").agg(F.count(F.lit(1)).alias("n_users"))
    kept = ui.join(
        item_pop.filter(F.col("n_users") <= 200).select("item"), "item"
    ).persist()
    deg = kept.groupBy("user_id").agg(F.count(F.lit(1)).alias("d"))
    a = kept.select("item", F.col("user_id").alias("u1"))
    b = kept.select("item", F.col("user_id").alias("u2"))
    pairs = (
        a.join(b, "item")
        .filter(F.col("u1") != F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    da = deg.select(F.col("user_id").alias("u1"), F.col("d").alias("da"))
    db = deg.select(F.col("user_id").alias("u2"), F.col("d").alias("db"))
    scored = (
        pairs.join(da, "u1")
        .join(db, "u2")
        .select(
            "u1",
            "u2",
            "shared",
            F.expr(
                "(1000000 * shared * shared) div (da * db)"
            ).alias("cos2_ppm"),
        )
    )
    w = Window.partitionBy("u1").orderBy(F.desc("cos2_ppm"), F.asc("u2"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("u1", "u2", "shared", "cos2_ppm")
    )


@register(
    "sim_mmr_rerank",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN (0, 1, 2, 3, 4)
),
scored AS (
  SELECT q.query_id, e.vec_id AS cand_id,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS rel
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id != q.query_id
),
cand AS (
  SELECT query_id, cand_id, rel FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, cand_id) AS rn
    FROM scored
  ) WHERE rn <= 10
),
ce AS (
  SELECT c.query_id, c.cand_id, c.rel, e.embedding AS c_emb
  FROM cand c JOIN embeddings e ON e.vec_id = c.cand_id
),
sims AS (
  SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
         {_COS_SQL.format(a="a.c_emb", b="b.c_emb")} AS sim
  FROM ce a JOIN ce b
    ON a.query_id = b.query_id AND a.cand_id != b.cand_id
),
s1 AS (
  SELECT query_id, cand_id AS doc_id, rel AS score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rel DESC, cand_id) AS rn
    FROM cand
  ) WHERE rn = 1
),
p2 AS (
  SELECT c.query_id, c.cand_id, round(c.rel - s.sim, 4) AS score
  FROM cand c
  JOIN s1 ON c.query_id = s1.query_id AND c.cand_id != s1.doc_id
  JOIN sims s ON s.query_id = c.query_id AND s.ca = c.cand_id
             AND s.cb = s1.doc_id
),
s2 AS (
  SELECT query_id, cand_id AS doc_id, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, cand_id) AS rn
    FROM p2
  ) WHERE rn = 1
),
p3 AS (
  SELECT c.query_id, c.cand_id,
         round(c.rel - greatest(x1.sim, x2.sim), 4) AS score
  FROM cand c
  JOIN s1 ON c.query_id = s1.query_id AND c.cand_id != s1.doc_id
  JOIN s2 ON c.query_id = s2.query_id AND c.cand_id != s2.doc_id
  JOIN sims x1 ON x1.query_id = c.query_id AND x1.ca = c.cand_id
              AND x1.cb = s1.doc_id
  JOIN sims x2 ON x2.query_id = c.query_id AND x2.ca = c.cand_id
              AND x2.cb = s2.doc_id
),
s3 AS (
  SELECT query_id, cand_id AS doc_id, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, cand_id) AS rn
    FROM p3
  ) WHERE rn = 1
)
SELECT query_id, CAST(1 AS INT) AS pos, doc_id, score AS mmr_score FROM s1
UNION ALL
SELECT query_id, CAST(2 AS INT), doc_id, score FROM s2
UNION ALL
SELECT query_id, CAST(3 AS INT), doc_id, score FROM s3
""",
    doc="Maximal-marginal-relevance diversified re-rank (lambda=0.5, "
    "top-3 from the exact-cosine top-10 shortlist): each greedy pick "
    "maximizes relevance MINUS similarity to the already-selected — "
    "the diversification pass that stops a result list (or a curated "
    "exemplar set) from being three near-copies of the same "
    "document. The greedy recurrence unrolls into fixed dataframe "
    "rounds (the graph_pagerank_items pattern), which keeps it "
    "oracle-expressible; the score uses the UNSCALED (rel - maxsim) "
    "difference — an exact multiple of 1e-4 given the rounded-4 "
    "inputs, hence engine-stable, where halving first could land on "
    ".00005 boundaries where double representation decides the "
    "round. Per-query extra work beyond the shortlist scorer is "
    "shortlist^2 pairwise sims (bounded self-join of the candidate "
    "table on query_id); the corpus streams exactly once.",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return similarity.mmr_rerank(e, [0, 1, 2, 3, 4], shortlist=10, k=3)


@register(
    "samp_temporal_embargo",
    oracle="""
WITH d AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
labeled AS (
  SELECT CASE WHEN day < 10970 THEN 'train'
              WHEN day < 11000 THEN 'embargo'
              ELSE 'test' END AS split,
         day, cents
  FROM d
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_orders,
       min(day) AS min_day, max(day) AS max_day,
       CAST(sum(cents) AS BIGINT) AS cents_total
FROM labeled GROUP BY split
""",
    doc="Temporal train/test split with an EMBARGO gap — the "
    "time-series-ML split rule (forecasting, fraud, ranking-model "
    "backtests): everything before the cutoff minus a 30-day embargo "
    "trains, everything after the cutoff tests, and the embargo rows "
    "between are DROPPED from both sides so label-window leakage "
    "(labels computed from post-cutoff behavior of pre-cutoff rows) "
    "cannot straddle the boundary — the temporal counterpart of "
    "samp_cluster_split's content-leakage rule. Assignment is a pure "
    "integer epoch-day comparison: partitioning/order-invariant, "
    "re-runs reproduce membership exactly. Plan: one scan, one "
    "map-side-combined 3-group aggregate — the split audit costs one "
    "pass and the split itself is a scan-stage filter that composes "
    "under any downstream operator (and prunes files outright on a "
    "date-partitioned layout).",
)
def samp_temporal_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    d = o.select(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    split = (
        F.when(F.col("day") < 10970, "train")
        .when(F.col("day") < 11000, "embargo")
        .otherwise("test")
    )
    return (
        d.select(split.alias("split"), "day", "cents")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
            F.sum("cents").alias("cents_total"),
        )
    )


@register(
    "graph_link_prediction",
    oracle=f"""
WITH {_KNN_EDGES_SQL},
nb AS (
  SELECT a AS node, b AS nbr FROM edges
  UNION ALL SELECT b, a FROM edges
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY node
),
wedges AS (
  SELECT x.nbr AS xa, y.nbr AS xb, CAST(count(*) AS BIGINT) AS common
  FROM nb x JOIN nb y ON x.node = y.node AND x.nbr < y.nbr
  GROUP BY 1, 2
),
cand AS (
  SELECT w.xa AS a, w.xb AS b, w.common
  FROM wedges w
  LEFT JOIN edges e ON e.a = w.xa AND e.b = w.xb
  WHERE e.a IS NULL
)
SELECT c.a, c.b, c.common,
       (1000000 * c.common) // (da.d + db.d - c.common) AS jaccard_ppm
FROM cand c
JOIN deg da ON da.node = c.a
JOIN deg db ON db.node = c.b
ORDER BY jaccard_ppm DESC, a, b
LIMIT 20
""",
    doc="Link prediction by neighbor Jaccard over the bounded-degree "
    "item graph: the top-20 NON-adjacent pairs whose neighborhoods "
    "overlap most — the classic 'these items should be related' "
    "candidate generator (and the graph-completion audit for a "
    "curated edge list). Candidates are exactly the wedge pairs "
    "(a-x-b sharing a neighbor, a<b, one equi self-join of the "
    "symmetrized adjacency on the shared node), minus existing edges "
    "via an anti-join; the score 1e6*|common| div (|N(a)|+|N(b)|-"
    "|common|) is pure BIGINT floor division. Completes the graph "
    "family's audit arc: PageRank ranks nodes, triangles measure "
    "cohesion, this predicts edges. Same scale fuse as "
    "graph_triangles — the top-5 degree cap bounds the wedge join at "
    "O(V*k^2) whatever the raw co-occurrence density; top-20 is "
    "TakeOrderedAndProject.",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    _knn, edges = _knn_edges(spark, sf_dir)
    nb = edges.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionByName(
        edges.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = nb.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    x = nb.select("node", F.col("nbr").alias("xa"))
    y = nb.select("node", F.col("nbr").alias("xb"))
    wedges = (
        x.join(y, "node")
        .filter(F.col("xa") < F.col("xb"))
        .groupBy("xa", "xb")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    cand = wedges.join(
        edges,
        (wedges.xa == edges.a) & (wedges.xb == edges.b),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("xa"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("xb"), F.col("d").alias("db"))
    return (
        cand.join(da, "xa")
        .join(db, "xb")
        .select(
            F.col("xa").alias("a"),
            F.col("xb").alias("b"),
            "common",
            F.expr(
                "(1000000 * common) div (da + db - common)"
            ).alias("jaccard_ppm"),
        )
        .orderBy(F.desc("jaccard_ppm"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@register(
    "multi_image_phash",
    oracle="""
WITH b AS (
  SELECT doc_id, substr(text, 1, 48) AS s FROM documents
),
bytes AS (
  SELECT doc_id,
         list_transform(range(1, least(length(s), 48) + 1),
                        i -> unicode(substr(s, i, 1))) AS bs
  FROM b
),
stats AS (
  SELECT doc_id, bs, len(bs) AS n,
         COALESCE(list_sum(bs), 0) AS tot
  FROM bytes
),
hashed AS (
  SELECT doc_id,
         CASE WHEN n = 0 THEN 0 ELSE
           CAST(COALESCE(list_sum(list_transform(
             range(1, n + 1),
             i -> CASE WHEN bs[i] * n > tot
                       THEN (CAST(1 AS BIGINT) << (i - 1))
                       ELSE 0 END)), 0) AS BIGINT)
         END AS phash
  FROM stats
)
SELECT phash,
       CAST(count(*) AS BIGINT) AS n_items,
       min(doc_id) AS first_item
FROM hashed
GROUP BY phash
HAVING count(*) >= 2
""",
    doc="Image dedup by perceptual hash: the deterministic fake "
    "payloads run through the Arrow-batched aHash kernel "
    "(mapInPandas — the only place bytes touch Python, once per "
    "batch), and items are grouped by the 48-bit hash; groups >= 2 "
    "are the near-duplicate report every image-corpus pipeline runs "
    "before training. The bit rule is the cross-multiplied integer "
    "predicate pixel*n > sum (no float mean), so the oracle can "
    "recompute the hash ANALYTICALLY from the same source text the "
    "fake payload embeds (pure-ASCII corpus: bytes == codepoints, "
    "verified octet_length == length over the whole table) — the "
    "full binary plumbing gets the strongest (hash-match) gate, like "
    "every other multimodal stage. At 100 TB the hash is a map-only "
    "pass over sharded payloads; the groupBy shuffles (48-bit, id) "
    "pairs only — images never move.",
)
def multi_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    images = _fake_images(spark, sf_dir)
    hashed = multimodal.image_phash(
        multimodal.shard_for_decode(images)
    )
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.min("item_id").alias("first_item"),
        )
        .filter(F.col("n_items") >= 2)
    )


# One label-propagation round as SQL: unlabeled nodes adopt the
# majority label among their labeled neighbors (votes DESC, label ASC
# tie-break); already-labeled nodes never change. Repeated verbatim per
# unrolled oracle round, like _pr_step_sql.
def _lp_round_sql(cur: str, nxt: str, rnd: int) -> str:
    return f"""
votes_{rnd} AS (
  SELECT nb.node, l.label, CAST(count(*) AS BIGINT) AS votes
  FROM nb JOIN {cur} l ON nb.nbr = l.item
  WHERE nb.node NOT IN (SELECT item FROM {cur})
  GROUP BY nb.node, l.label
),
new_{rnd} AS (
  SELECT node AS item, label, CAST({rnd} AS INT) AS round_assigned
  FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node
                              ORDER BY votes DESC, label) AS rn
    FROM votes_{rnd}
  ) WHERE rn = 1
),
{nxt} AS (
  SELECT item, label, round_assigned FROM {cur}
  UNION ALL SELECT item, label, round_assigned FROM new_{rnd}
)""".strip()


@register(
    "graph_label_propagation",
    oracle=f"""
WITH {_KNN_EDGES_SQL},
nb AS (
  SELECT a AS node, b AS nbr FROM edges
  UNION ALL SELECT b, a FROM edges
),
l0 AS (
  SELECT DISTINCT least(src, dst) AS item,
         least(src, dst) % 3 AS label,
         CAST(0 AS INT) AS round_assigned
  FROM knn WHERE least(src, dst) % 7 = 0
  UNION
  SELECT DISTINCT greatest(src, dst), greatest(src, dst) % 3,
         CAST(0 AS INT)
  FROM knn WHERE greatest(src, dst) % 7 = 0
),
{_lp_round_sql("l0", "l1", 1)},
{_lp_round_sql("l1", "l2", 2)}
SELECT item, CAST(label AS BIGINT) AS label, round_assigned FROM l2
""",
    doc="Semi-supervised label propagation over the bounded-degree "
    "item graph: ~1/7 of the nodes carry seed labels (3 classes), "
    "and two unrolled majority-vote rounds spread them — unlabeled "
    "nodes adopt the most-voted label among labeled neighbors "
    "(votes DESC, label ASC tie-break), labeled nodes are immutable. "
    "This is the auto-labeling workhorse for sparse-annotation "
    "corpora (and the batch shape of community detection): all "
    "integer votes, no damping floats, so the unrolled-CTE oracle "
    "matches exactly, like graph_pagerank_items. Per round: one "
    "equi-join of the adjacency against the label table + one "
    "map-side-combined vote count + one per-node window on the "
    "vote table — the label table is node-bounded, the adjacency is "
    "degree-capped, and document/item payloads never move. Fixed "
    "round count keeps it oracle-expressible; production loops with "
    "the CC operator's localCheckpoint + fixpoint-sum pattern.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    _knn, edges = _knn_edges(spark, sf_dir)
    nb = edges.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionByName(
        edges.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    ).persist()
    nodes = nb.select("node").distinct()
    labels = (
        nodes.filter(F.col("node") % 7 == 0)
        .select(
            F.col("node").alias("item"),
            (F.col("node") % 3).alias("label"),
            F.lit(0).cast("int").alias("round_assigned"),
        )
        .localCheckpoint()
    )
    for rnd in (1, 2):
        labeled_ids = labels.select(F.col("item").alias("node"))
        votes = (
            nb.join(F.broadcast(labeled_ids), "node", "left_anti")
            .join(
                labels.select(
                    F.col("item").alias("nbr"), F.col("label")
                ),
                "nbr",
            )
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        wv = Window.partitionBy("node").orderBy(
            F.desc("votes"), F.asc("label")
        )
        new = (
            votes.withColumn("rn", F.row_number().over(wv))
            .filter(F.col("rn") == 1)
            .select(
                F.col("node").alias("item"),
                "label",
                F.lit(rnd).cast("int").alias("round_assigned"),
            )
        )
        labels = labels.unionByName(new).localCheckpoint()
    return labels.select(
        "item", F.col("label").cast("long").alias("label"), "round_assigned"
    )


@register(
    "pipe_pretrain_layout",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
scored AS (
  SELECT doc_id, t, toks,
       {_SCORE_COLS}
  FROM tok
),
feats AS (
  SELECT doc_id, t,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         round(CAST(len(list_filter(toks, x -> x IN ({_STOPWORDS_SQL})))
                    AS BIGINT) / CAST(len(toks) AS DOUBLE), 4)
           AS stopword_ratio,
         {_LANG_CASE} AS lang_pred,
         md5(t) AS fingerprint
  FROM scored
),
kept AS (
  SELECT * FROM feats
  WHERE n_tokens >= 30 AND stopword_ratio >= 0.03 AND lang_pred = 'en'
),
canon AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint
                                 ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
),
train AS (
  SELECT doc_id, n_tokens
  FROM (SELECT *, {_bucket_sql("split", "doc_id")} AS b FROM canon)
  WHERE b < 8000
),
n AS (
  SELECT doc_id, n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64
           AS bucket
  FROM train WHERE n_tokens > 0
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (
           ORDER BY bucket, doc_id ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS tok_end
  FROM n
),
s AS (
  SELECT doc_id, n_tokens, tok_end, tok_end - n_tokens AS tok_start FROM c
),
ch AS (
  SELECT doc_id, tok_start, tok_end,
         unnest(generate_series(tok_start // 1024, (tok_end - 1) // 1024))
           AS chunk_id
  FROM s
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, tok_start, tok_end,
       CAST(least(tok_end, (chunk_id + 1) * 1024)
            - greatest(tok_start, chunk_id * 1024) AS BIGINT) AS span_len
FROM ch
""",
    doc="The pre-training data layout end-to-end, ONE composed plan: "
    "quality filter -> language filter -> exact dedup -> leakage-"
    "safe hash split -> TRAIN slice -> concat-and-chunk packing into "
    "1024-token windows. Every stage is the already-oracle-verified "
    "operator reused verbatim (pipe_corpus_curation feeding "
    "packing.concat_chunks), which is the point: curation decisions "
    "and the physical training layout stay ONE lineage — no "
    "intermediate table whose staleness can desynchronize what was "
    "selected from what gets packed. Plan shape: the curation side "
    "is one digest shuffle; packing adds the two-pass distributed "
    "prefix sum (64-row bucket offsets broadcast back) — nothing "
    "global-sorts, and the corpus text itself never moves past the "
    "scan stage.",
)
def pipe_pretrain_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    curated = pipe_corpus_curation(spark, sf_dir)
    train = curated.filter(F.col("split") == "train")
    return packing.concat_chunks(
        train, "doc_id", F.col("n_tokens"), ctx=1024, n_buckets=64
    )


@register(
    "tj_asof_nearest",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'click' AND ts IS NOT NULL
),
r0 AS (
  SELECT user_id, ts, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
),
r1 AS (SELECT user_id, ts, event_id, value FROM r0 WHERE rn = 1),
mb AS (
  SELECT l.event_id, r1.ts AS b_ts, r1.event_id AS b_eid,
         r1.value AS b_val
  FROM l ASOF LEFT JOIN r1
    ON l.user_id = r1.user_id AND r1.ts <= l.ts
),
mf AS (
  SELECT l.event_id, r1.ts AS f_ts, r1.event_id AS f_eid,
         r1.value AS f_val
  FROM l ASOF LEFT JOIN r1
    ON l.user_id = r1.user_id AND r1.ts >= l.ts
),
tolerated AS (
  SELECT l.user_id, l.ts, l.event_id, l.value,
         CASE WHEN epoch_us(l.ts) - epoch_us(b_ts) <= 1800000000
              THEN b_ts END AS b_ts,
         CASE WHEN epoch_us(l.ts) - epoch_us(b_ts) <= 1800000000
              THEN b_eid END AS b_eid,
         CASE WHEN epoch_us(l.ts) - epoch_us(b_ts) <= 1800000000
              THEN b_val END AS b_val,
         CASE WHEN epoch_us(f_ts) - epoch_us(l.ts) <= 1800000000
              THEN f_ts END AS f_ts,
         CASE WHEN epoch_us(f_ts) - epoch_us(l.ts) <= 1800000000
              THEN f_eid END AS f_eid,
         CASE WHEN epoch_us(f_ts) - epoch_us(l.ts) <= 1800000000
              THEN f_val END AS f_val
  FROM l JOIN mb USING (event_id) JOIN mf USING (event_id)
)
SELECT user_id, ts, event_id, value,
       CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                 epoch_us(ts) - epoch_us(b_ts)
                 <= epoch_us(f_ts) - epoch_us(ts))
            THEN b_ts ELSE f_ts END AS matched_ts,
       CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                 epoch_us(ts) - epoch_us(b_ts)
                 <= epoch_us(f_ts) - epoch_us(ts))
            THEN b_eid ELSE f_eid END AS matched_event_id,
       CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                 epoch_us(ts) - epoch_us(b_ts)
                 <= epoch_us(f_ts) - epoch_us(ts))
            THEN b_val ELSE f_val END AS matched_value
FROM tolerated
""",
    doc="NEAREST as-of join with tolerance — completes the "
    "backward/forward/nearest merge_asof triple: each click gets the "
    "closest same-user purchase in EITHER direction (ties pinned to "
    "backward; the oracle implements the same rule via two "
    "independent native ASOF JOINs + a CASE). Engine side runs BOTH "
    "carries over the ONE key exchange (two frames, same "
    "partitioning — an extra in-partition sort, no extra shuffle, "
    "still no join node). Tolerance follows pandas merge_asof "
    "exactly: each direction's candidate is gap-checked BEFORE the "
    "nearer one is chosen, so an out-of-tolerance nearest side "
    "falls back to the other side's in-tolerance match.",
)
def tj_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return temporal.asof_join(
        clicks, purchases, by=["user_id"],
        right_cols=["event_id", "value"], tie_col="event_id",
        direction="nearest", tolerance_seconds=1800,
    ).select(
        "user_id", "ts", "event_id", "value",
        "matched_ts", "matched_event_id", "matched_value",
    )


@register(
    "w15_skyline_orders",
    oracle="""
WITH cents AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
),
daycounts AS (
  SELECT day, c, CAST(count(*) AS BIGINT) AS n
  FROM cents GROUP BY day, c
),
daymax AS (
  SELECT day, c AS cmax, n AS n_at_max FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY day ORDER BY c DESC) AS rn
    FROM daycounts
  ) WHERE rn = 1
)
SELECT d.day, d.cmax AS cents_max, d.n_at_max
FROM daymax d
WHERE NOT EXISTS (
  SELECT 1 FROM daymax q
  WHERE q.day < d.day AND q.cmax >= d.cmax
)
""",
    doc="2-D Pareto skyline (earlier day better, higher order value "
    "better): the days not dominated by any strictly-earlier day "
    "with at-least-equal maximum order value — the skyline / non-"
    "dominated-set operator behind multi-criteria 'best offers' "
    "queries. The reduction is the point: a skyline row must carry "
    "its day's MAXIMUM value (a same-day higher value dominates), so "
    "the fact first collapses to per-(day, value) counts and per-day "
    "maxima, and the skyline itself is a strict running-max filter "
    "over O(days) rows. The oracle is the INDEPENDENT NOT-EXISTS "
    "dominance formulation, so the window reduction is proven "
    "equivalent to the definition, not assumed. The final window is "
    "deliberately single-partition over the DAY-GRAIN rollup (the "
    "w11 pattern — O(days), never O(rows)); the distributed form "
    "for a non-collapsible skyline is per-partition local skylines "
    "merged, which this pre-aggregation subsumes. Rows missing "
    "either coordinate are excluded on both sides - a NULL day "
    "neither dominates nor is dominated under 3VL, which silently "
    "diverges from the window form (null_fuzz_sweep).",
)
def w15_skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    cents = o.filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    ).select(
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
    )
    daycounts = cents.groupBy("day", "c").agg(
        F.count(F.lit(1)).alias("n")
    )
    wd = Window.partitionBy("day").orderBy(F.desc("c"))
    daymax = (
        daycounts.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select(
            "day", F.col("c").alias("cents_max"), F.col("n").alias("n_at_max")
        )
    )
    ws = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    return (
        daymax.withColumn(
            "_prevmax", F.max("cents_max").over(ws)
        )
        .filter(
            F.col("_prevmax").isNull()
            | (F.col("cents_max") > F.col("_prevmax"))
        )
        .select("day", "cents_max", "n_at_max")
    )


@register(
    "tj_interval_overlap",
    oracle="""
WITH a AS (
  SELECT user_id, event_id AS a_id, epoch_us(ts) AS s
  FROM events WHERE event_type = 'view'
),
b AS (
  SELECT user_id, event_id AS b_id, epoch_us(ts) AS s
  FROM events WHERE event_type = 'click'
)
SELECT a.user_id, a.a_id, b.b_id,
       CAST(least(a.s + 600000000, b.s + 600000000)
            - greatest(a.s, b.s) AS BIGINT) AS overlap_us
FROM a JOIN b
  ON a.user_id = b.user_id
 AND a.s < b.s + 600000000
 AND b.s < a.s + 600000000
""",
    doc="Interval-overlap join (10-minute view dwells x 10-minute "
    "click dwells per user, end-exclusive) — the two-sided "
    "generalization of the binned range join: shift-conflict / "
    "concurrent-session detection. The oracle is the raw DOUBLE-"
    "INEQUALITY join (which a naive engine plans as a per-key nested "
    "loop); the engine side is the equi-join on (user, time-bin) "
    "with each interval exploding to <= 2 bins and duplicates "
    "suppressed POSITIONALLY — a multi-bin pair emits only from the "
    "bin containing the later start, which provably lies in both "
    "intervals — so no distinct, no second exchange "
    "(operators/temporal.py interval_overlap_join_binned). Plan-"
    "pinned hash join, never a nested loop.",
)
def tj_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    a = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
    )
    b = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts")
    )
    return temporal.interval_overlap_join_binned(
        a, b, by=["user_id"], a_start="a_ts", b_start="b_ts",
        a_len_seconds=600, b_len_seconds=600,
    ).select("user_id", "a_id", "b_id", "overlap_us")


@register(
    "dq_uniqueness_profile",
    oracle="""
WITH stacked AS (
  SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS v FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL
  SELECT 'o_orderpriority', o_orderpriority FROM orders
)
SELECT col,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
       (1000000 * count(DISTINCT v)) // count(*) AS uniq_ppm,
       CAST(count(*) - count(v) AS BIGINT) AS n_null
FROM stacked GROUP BY col
""",
    doc="Per-column uniqueness profile from ONE stacked scan: row "
    "count, exact distinct count, integer-ppm uniqueness ratio, and "
    "null count for each profiled column — the candidate-key / "
    "join-key-quality discovery pass (uniq_ppm = 1e6 says key; "
    "near-0 says low-cardinality dimension), complementing "
    "dq_key_skew_report's hot-value view of the same decision. "
    "Values stack as strings (one map-side unpivot, no per-column "
    "jobs); the exact COUNT(DISTINCT) per column is the Expand-plan "
    "cost shape a21_multi_distinct pins, and the documented at-scale "
    "swap is one HLL register file per column (sk_hll_* family) when "
    "exactness isn't required.",
)
def dq_uniqueness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    stacked = o.select(
        F.expr(
            "stack(4, 'o_orderkey', CAST(o_orderkey AS STRING), "
            "'o_custkey', CAST(o_custkey AS STRING), "
            "'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority) AS (col, v)"
        )
    )
    return stacked.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("v")).alias("n_distinct"),
        F.expr(
            "(1000000 * count(DISTINCT v)) div count(*)"
        ).alias("uniq_ppm"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
    )


@register(
    "a23_weighted_median",
    oracle="""
WITH cents AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
byval AS (
  SELECT l_returnflag, c, CAST(sum(w) AS BIGINT) AS wv
  FROM cents GROUP BY l_returnflag, c
),
cum AS (
  SELECT l_returnflag, c, wv,
         CAST(SUM(wv) OVER (PARTITION BY l_returnflag ORDER BY c
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
         CAST(SUM(wv) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tw
  FROM byval
)
SELECT l_returnflag, min(c) AS weighted_median_cents,
       min(tw) AS total_weight
FROM cum WHERE 2 * cw >= tw
GROUP BY l_returnflag
""",
    doc="Exact WEIGHTED median (price weighted by quantity) per "
    "group — the inventory-weighted 'typical unit price' that a "
    "plain median misstates when line sizes vary. Lower weighted "
    "median convention: the smallest value whose cumulative weight "
    "reaches half the total, via the cross-multiplied integer "
    "predicate 2*cum >= total — no halving, no interpolation, every "
    "column BIGINT. The fact first collapses to per-(group, value) "
    "weight sums (map-side combined), so the cumulative window runs "
    "over the VALUE DOMAIN per group, not the rows — the same "
    "rollup-before-window discipline as w13/w15; at 100 TB the "
    "value domain (distinct cents) bounds the window, and the "
    "sketch swap is a weighted histogram (sk_hist family). Rows "
    "with NULL price or NULL weight are excluded on both sides — a "
    "missing value cannot carry weight mass (null_fuzz_sweep).",
)
def a23_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("c"),
        F.col("l_quantity").cast("long").alias("w"),
    ).filter(F.col("c").isNotNull() & F.col("w").isNotNull())
    byval = cents.groupBy("l_returnflag", "c").agg(
        F.sum("w").alias("wv")
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    cum = byval.select(
        "l_returnflag",
        "c",
        F.sum("wv").over(wcum).alias("cw"),
        F.sum("wv").over(wtot).alias("tw"),
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("c").alias("weighted_median_cents"),
            F.min("tw").alias("total_weight"),
        )
    )


@register(
    "a24_mode",
    oracle="""
WITH cents AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) % 1000 AS last_cents
  FROM orders
),
counts AS (
  SELECT o_orderpriority, last_cents, count(*) AS cnt
  FROM cents GROUP BY 1, 2
),
top AS (
  SELECT o_orderpriority, last_cents AS mode_value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                 ORDER BY cnt DESC, last_cents) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT t.o_orderpriority, CAST(t.mode_value AS BIGINT) AS mode_value,
       CAST(g.n AS BIGINT) AS n
FROM top t JOIN (
  SELECT o_orderpriority, count(*) AS n FROM cents GROUP BY 1
) g USING (o_orderpriority)
""",
    doc="Exact per-group MODE with a PINNED tie rule: most frequent "
    "value, ties to the smallest (count DESC, value ASC). Native "
    "mode() aggregates are exactly what this entry exists to "
    "replace: DuckDB's (and most engines') mode breaks ties by scan "
    "order — verified non-deterministic on this very data — so a "
    "reproducible pipeline needs the explicit count-rollup + argmax "
    "formulation on BOTH engines. Plan: per-(group, value) counts "
    "map-side combined, then a per-group window argmax over the "
    "value domain — two bounded exchanges, no sort of the fact.",
)
def a24_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    cents = o.select(
        "o_orderpriority",
        (F.round(F.col("o_totalprice") * 100, 0).cast("long") % 1000).alias(
            "last_cents"
        ),
    )
    counts = cents.groupBy("o_orderpriority", "last_cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("cnt"), F.asc("last_cents")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority", F.col("last_cents").alias("mode_value")
        )
        .join(
            cents.groupBy("o_orderpriority").agg(
                F.count(F.lit(1)).alias("n")
            ),
            "o_orderpriority",
        )
        .select("o_orderpriority", "mode_value", "n")
    )


@register(
    "dedup_pipeline_eval",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
{SQL_MINHASH},
buckets AS (
  SELECT doc_id, CAST(hash_idx // 4 AS INT) AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_idx))
           AS band_digest
  FROM signatures
  GROUP BY doc_id, CAST(hash_idx // 4 AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a
  JOIN buckets b ON a.band = b.band AND a.band_digest = b.band_digest
  WHERE a.doc_id < b.doc_id
),
shh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
  FROM sh
),
kept AS (SELECT h FROM shh GROUP BY h HAVING count(*) <= 100),
shf AS (SELECT shh.doc_id, shh.h FROM shh JOIN kept USING (h)),
sizes AS (SELECT doc_id, count(h) AS set_size FROM shf GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(a.h) AS n_inter
  FROM shf a JOIN shf b ON a.h = b.h AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT doc_a, doc_b FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(n_inter / CAST(sa.set_size + sb.set_size - n_inter
                             AS DOUBLE), 4) >= 0.12
),
joined AS (
  SELECT COALESCE(t.doc_a, c.doc_a) AS doc_a,
         t.doc_a IS NOT NULL AS is_true,
         c.doc_a IS NOT NULL AS is_cand
  FROM truth t FULL OUTER JOIN cand c
    ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
)
SELECT CAST(sum(CASE WHEN is_true AND is_cand THEN 1 ELSE 0 END)
            AS BIGINT) AS tp,
       CAST(sum(CASE WHEN is_true AND NOT is_cand THEN 1 ELSE 0 END)
            AS BIGINT) AS fn,
       CAST(sum(CASE WHEN is_cand AND NOT is_true THEN 1 ELSE 0 END)
            AS BIGINT) AS fp,
       CAST((1000000 * sum(CASE WHEN is_true AND is_cand THEN 1 ELSE 0
                               END))
         // greatest(sum(CASE WHEN is_true THEN 1 ELSE 0 END), 1)
         AS BIGINT) AS recall_ppm,
       CAST((1000000 * sum(CASE WHEN is_true AND is_cand THEN 1 ELSE 0
                               END))
         // greatest(sum(CASE WHEN is_cand THEN 1 ELSE 0 END), 1)
         AS BIGINT) AS precision_ppm
FROM joined
""",
    doc="Dedup-pipeline evaluation IN the engine: LSH discovery "
    "(dedup_minhash_lsh's exact plan) scored against ground truth "
    "(dedup_ngram_jaccard's exact plan, thr 0.12) — TP/FN/FP plus "
    "integer-ppm recall and precision in ONE scalar row. This is "
    "the measurement every 'tune bands vs rows' decision needs, and "
    "composing two already-verified operators means the evaluation "
    "can never drift from what production actually runs. FULL OUTER "
    "on the pair key classifies; map-side-combined scalar aggregate "
    "reduces; floor-division ppm with a greatest(. ,1) guard keeps "
    "the empty-truth edge exact on both engines. At 100 TB the "
    "ground-truth side is the bounded verify-stage join (shingle-DF "
    "cap), typically run on a SAMPLE — the composition is unchanged.",
)
def dedup_pipeline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    truth = dedup.ngram_jaccard_pairs(
        d, k=3, threshold=0.12, max_shingle_df=100
    ).select("doc_a", "doc_b", F.lit(True).alias("is_true"))
    cand = dedup.minhash_lsh_candidates(
        d, num_hashes=16, rows_per_band=4, k=3
    ).select("doc_a", "doc_b", F.lit(True).alias("is_cand"))
    joined = truth.join(cand, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce(F.col("is_true"), F.lit(False)).alias("is_true"),
        F.coalesce(F.col("is_cand"), F.lit(False)).alias("is_cand"),
    )
    tp = F.sum(F.when(F.col("is_true") & F.col("is_cand"), 1).otherwise(0))
    fn = F.sum(F.when(F.col("is_true") & ~F.col("is_cand"), 1).otherwise(0))
    fp = F.sum(F.when(F.col("is_cand") & ~F.col("is_true"), 1).otherwise(0))
    nt = F.sum(F.when(F.col("is_true"), 1).otherwise(0))
    nc = F.sum(F.when(F.col("is_cand"), 1).otherwise(0))
    return joined.agg(
        tp.cast("long").alias("tp"),
        fn.cast("long").alias("fn"),
        fp.cast("long").alias("fp"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN is_true AND is_cand THEN 1 "
            "ELSE 0 END)) div greatest(sum(CASE WHEN is_true THEN 1 "
            "ELSE 0 END), 1) AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN is_true AND is_cand THEN 1 "
            "ELSE 0 END)) div greatest(sum(CASE WHEN is_cand THEN 1 "
            "ELSE 0 END), 1) AS BIGINT)"
        ).alias("precision_ppm"),
    )


@register(
    "graph_modularity",
    oracle=f"""
WITH {_KNN_EDGES_SQL},
nb AS (
  SELECT a AS node, b AS nbr FROM edges
  UNION ALL SELECT b, a FROM edges
),
l0 AS (
  SELECT DISTINCT least(src, dst) AS item,
         least(src, dst) % 3 AS label,
         CAST(0 AS INT) AS round_assigned
  FROM knn WHERE least(src, dst) % 7 = 0
  UNION
  SELECT DISTINCT greatest(src, dst), greatest(src, dst) % 3,
         CAST(0 AS INT)
  FROM knn WHERE greatest(src, dst) % 7 = 0
),
{_lp_round_sql("l0", "l1", 1)},
{_lp_round_sql("l1", "l2", 2)},
nodes AS (SELECT DISTINCT node FROM nb),
comm AS (
  SELECT n.node,
         COALESCE(l.label, -(n.node + 1)) AS community
  FROM nodes n LEFT JOIN l2 l ON l.item = n.node
),
m AS (SELECT CAST(count(*) AS BIGINT) AS m_edges FROM edges),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY node
),
dc AS (
  SELECT c.community, CAST(sum(deg.d) AS BIGINT) AS d_c
  FROM comm c JOIN deg ON deg.node = c.node
  GROUP BY c.community
),
ec AS (
  SELECT ca.community, CAST(count(*) AS BIGINT) AS e_c
  FROM edges e
  JOIN comm ca ON ca.node = e.a
  JOIN comm cb ON cb.node = e.b
  WHERE ca.community = cb.community
  GROUP BY ca.community
)
SELECT CAST((SELECT count(*) FROM dc) AS BIGINT) AS n_communities,
       (SELECT m_edges FROM m) AS m_edges,
       CAST(sum(4 * (SELECT m_edges FROM m) * COALESCE(ec.e_c, 0)
                - dc.d_c * dc.d_c) AS BIGINT) AS q_num,
       CAST(4 * (SELECT m_edges FROM m) * (SELECT m_edges FROM m)
            AS BIGINT) AS q_den
FROM dc LEFT JOIN ec ON dc.community = ec.community
""",
    doc="Newman modularity of the label-propagation partition as an "
    "EXACT RATIONAL: Q = sum_c(e_c/m - (d_c/2m)^2) is cleared of "
    "fractions to q_num = sum_c(4m*e_c - d_c^2) over q_den = 4m^2 — "
    "pure BIGINT, so the partition-quality score that normally "
    "arrives as a float is bit-identical on both engines (the "
    "ts_linear_trend rational-output pattern). Unlabeled nodes are "
    "singleton communities (the standard treatment), so Q is "
    "well-defined over the whole graph. This closes the graph "
    "analytics loop: propagate labels, then SCORE the partition — "
    "the accept/reject gate for any community assignment. Plan: "
    "intra-community edge counts are one edges⋈community⋈community "
    "equi-join chain; degree mass one rollup; all tables are node- "
    "or community-bounded; 4m*e_c needs 128-bit headroom at "
    "trillion-edge scale (DECIMAL/HUGEINT intermediates, BIGINT "
    "out).",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = graph_label_propagation(spark, sf_dir)
    # the SAME persisted capped edge list the LP entry built — the
    # quadratic co-occurrence self-join runs once per invocation, not
    # twice (review finding, round 5)
    _knn, edges = _knn_edges(spark, sf_dir)
    nb = edges.select(
        F.col("a").alias("node"), F.col("b").alias("nbr")
    ).unionByName(
        edges.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    nodes = nb.select("node").distinct()
    comm = nodes.join(
        labels.select(F.col("item").alias("node"), "label"),
        "node",
        "left",
    ).select(
        "node",
        F.coalesce(F.col("label"), -(F.col("node") + 1)).alias("community"),
    ).persist()
    m_edges = edges.count()
    deg = nb.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    dc = comm.join(deg, "node").groupBy("community").agg(
        F.sum("d").alias("d_c")
    )
    ca = comm.select(F.col("node").alias("a"), F.col("community").alias("comm_a"))
    cb = comm.select(F.col("node").alias("b"), F.col("community").alias("comm_b"))
    ec = (
        edges.join(ca, "a")
        .join(cb, "b")
        .filter(F.col("comm_a") == F.col("comm_b"))
        .groupBy(F.col("comm_a").alias("community"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    per_c = dc.join(ec, "community", "left").select(
        "community",
        F.coalesce(F.col("e_c"), F.lit(0)).alias("e_c"),
        "d_c",
    )
    return per_c.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.lit(m_edges).cast("long").alias("m_edges"),
        F.sum(
            4 * F.lit(m_edges) * F.col("e_c") - F.col("d_c") * F.col("d_c")
        )
        .cast("long")
        .alias("q_num"),
        F.lit(4 * m_edges * m_edges).cast("long").alias("q_den"),
    )


@register(
    "samp_apportion_lr",
    oracle="""
WITH strata AS (
  SELECT o_orderpriority AS stratum, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM strata),
quota AS (
  SELECT stratum, n,
         (1000 * n) // t AS base,
         (1000 * n) % t AS rem
  FROM strata CROSS JOIN tot
),
short AS (
  SELECT CAST(1000 - sum(base) AS BIGINT) AS k_left FROM quota
),
ranked AS (
  SELECT stratum, n, base, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rk
  FROM quota
)
SELECT r.stratum, r.n,
       CAST(r.base + CASE WHEN r.rk <= s.k_left THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM ranked r CROSS JOIN short s
""",
    doc="Largest-remainder (Hamilton) apportionment of a fixed sample "
    "budget (k=1000) across strata, exactly: integer base quotas "
    "floor(k*n_s/N) plus one extra for the strata with the largest "
    "remainders (k*n_s mod N, ties to stratum name) until the budget "
    "is spent — allocations sum to EXACTLY k and are within one of "
    "true proportionality, which per-stratum float rounding cannot "
    "guarantee. This is the missing piece between samp_stratified "
    "(fractions, not exact counts) and samp_weighted_fixed_k (exact "
    "k, no strata): the apportionment FEEDS a per-stratum exact-k "
    "selection (hash top-k within stratum, samp_per_group_topn's "
    "shape). Pure BIGINT floor-div/mod throughout; the remainder "
    "ranking is a window over O(strata) rows.",
)
def samp_apportion_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")["orders"]
    strata = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = strata.agg(F.sum("n").alias("t"))
    quota = strata.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n",
        F.expr("(1000 * n) div t").alias("base"),
        ((1000 * F.col("n")) % F.col("t")).alias("rem"),
    )
    short = quota.agg((F.lit(1000) - F.sum("base")).alias("k_left"))
    wr = Window.orderBy(F.desc("rem"), F.asc("stratum"))
    return (
        quota.withColumn("rk", F.row_number().over(wr))
        .crossJoin(F.broadcast(short))
        .select(
            "stratum",
            "n",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("k_left"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )


@register(
    "sim_ann_recall_eval",
    oracle=f"""
WITH qset AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN (0, 1, 2, 3, 4)
),
bf_scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS cos_sim
  FROM embeddings e CROSS JOIN qset q
  WHERE e.vec_id != q.query_id
),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM bf_scored
  ) WHERE rn <= 10
),
c AS (
  SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
  WHERE vec_id < 8
),
assign_scored AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         {_COS_SQL.format(a="e.embedding", b="c.c_emb")} AS cos_sim
  FROM embeddings e CROSS JOIN c
),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cos_sim DESC, centroid_id) AS rn
    FROM assign_scored WHERE vec_id IN (0, 1, 2, 3, 4)
  ) WHERE rn <= 2
),
ivf_scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {_COS_SQL.format(a="q.q_emb", b="e.embedding")} AS cos_sim
  FROM assigned e JOIN q ON e.centroid_id = q.centroid_id
  WHERE e.vec_id != q.query_id
),
got AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, neighbor_id) AS rn
    FROM ivf_scored
  ) WHERE rn <= 10
)
SELECT t.query_id,
       CAST(count(*) AS BIGINT) AS n_truth,
       CAST(sum(CASE WHEN g.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       CAST((1000000 * sum(CASE WHEN g.neighbor_id IS NOT NULL
                                THEN 1 ELSE 0 END)) // count(*)
            AS BIGINT) AS recall_ppm
FROM truth t
LEFT JOIN got g
  ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id
GROUP BY t.query_id
""",
    doc="ANN recall@10 measured IN the engine: the multi-probe IVF "
    "plan (sim_ivf_topk_mp, 2 probes) scored against brute-force "
    "ground truth (sim_bruteforce_topk) per query — integer-ppm "
    "recall from a LEFT JOIN of the two already-verified top-k "
    "plans. The retrieval twin of dedup_pipeline_eval: every "
    "probes/centroids tuning decision needs this number, and "
    "composing the registered plans means the measurement can never "
    "drift from what production runs. At scale the truth side runs "
    "on a query SAMPLE (brute force over the sample only — still "
    "one corpus pass); the composition is unchanged.",
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    truth = similarity.brute_force_topk(e, [0, 1, 2, 3, 4], k=10).select(
        "query_id", "neighbor_id", F.lit(True).alias("is_truth")
    )
    got = similarity.ivf_topk(
        e, [0, 1, 2, 3, 4], k=10, n_centroids=8, probes=2
    ).select("query_id", "neighbor_id", F.lit(True).alias("is_got"))
    joined = truth.join(got, ["query_id", "neighbor_id"], "left")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(F.when(F.col("is_got"), 1).otherwise(0))
        .cast("long")
        .alias("n_hit"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN is_got THEN 1 ELSE 0 END)) "
            "div count(*) AS BIGINT)"
        ).alias("recall_ppm"),
    )


@register(
    "sim_threshold_calibration",
    oracle=f"""
WITH buckets AS (
{_EMB_LSH_BUCKETS_SQL}
),
kept AS (
  SELECT band, bucket FROM buckets
  GROUP BY band, bucket HAVING COUNT(*) <= {_EMB_LSH_MAX_BUCKET}
),
bucketsf AS (
  SELECT b.* FROM buckets b JOIN kept USING (band, bucket)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bucketsf a
  JOIN bucketsf b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
pairs AS (
  SELECT vec_a, vec_b,
         {_COS_SQL.format(a="ea.embedding", b="eb.embedding")} AS cos_sim
  FROM cand
  JOIN embeddings ea ON ea.vec_id = vec_a
  JOIN embeddings eb ON eb.vec_id = vec_b
)
SELECT CAST(floor(cos_sim * 20) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1
""",
    doc="Near-dup threshold calibration: the cosine HISTOGRAM "
    "(0.05-wide bins) over ALL LSH candidate pairs, unthresholded — "
    "the distribution a practitioner reads to PLACE the near-dup "
    "cutoff (true near-dups pile up near 1.0, the background mass "
    "sits low; the valley is the threshold). Upstream of "
    "dedup_embedding_lsh, which then applies the chosen cutoff, and "
    "sideways of dedup_pipeline_eval, which scores it. Binning is "
    "floor(cos*20) on the identical rounded-4 doubles both engines "
    "compute, so bin edges are engine-stable; bucket-capped LSH "
    "discovery bounds the candidate volume exactly as in the dedup "
    "entry — the histogram costs one extra map-side-combined "
    "aggregate over pairs already produced.",
)
def sim_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    pairs = similarity.lsh_near_dup_pairs(
        e, threshold=-1.0,
        n_bands=_EMB_LSH_BANDS, planes_per_band=_EMB_LSH_PLANES_PER_BAND,
        max_bucket_size=_EMB_LSH_MAX_BUCKET,
    )
    return pairs.groupBy(
        F.floor(F.col("cos_sim") * 20).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "text_zipf_fit",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
uni AS (SELECT unnest(toks) AS w FROM tok),
freq AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM uni GROUP BY w),
ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS r
  FROM freq
),
top AS (SELECT * FROM ranked WHERE r <= 1000),
pts AS (
  SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS y
  FROM top
),
sums AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_tokens_fit,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
FROM sums
""",
    doc="Zipf-exponent fit: OLS slope of ln(frequency) on ln(rank) "
    "over the top-1000 tokens, as the EXACT RATIONAL num/den (the "
    "ts_linear_trend pattern) — natural corpora sit near -1, and "
    "drift toward 0 (too flat: template spam) or below -1.5 (too "
    "steep: tiny vocabulary) is a corpus-health alarm no per-"
    "document quality score catches. Both logs are floored to "
    "integer micro-nats BEFORE the moment sums (the libm-"
    "determinism pattern: identical integer-derived doubles through "
    "one ln each), so the regression inputs — and therefore the "
    "rational slope — are bit-identical on both engines. Plan: one "
    "vocabulary-bounded count aggregate, then the top-1000 is "
    "selected by orderBy().limit() — TakeOrderedAndProject, the "
    "per-partition-heap top-k every other top-k in the repo uses — "
    "NOT a rank window over the whole vocabulary (10^8 tokens on a "
    "web corpus would sort on one partition; VERDICT r6 #2); the "
    "rank needed for ln(rank) is then re-derived by a window over "
    "the 1000 SURVIVORS only, and a 1-row moment reduce follows; "
    "the corpus text leaves the scan only as tokens.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")["documents"]
    uni = d.select(F.explode(textops.tokens(F.col("text"))).alias("w"))
    freq = uni.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    # (cnt DESC, w ASC) is a total order (w unique after groupBy), so
    # limit(1000) under it selects exactly the rank <= 1000 set; the
    # window below then runs over <= 1000 rows — bounded by the limit,
    # not the vocabulary.
    top1000 = freq.orderBy(F.desc("cnt"), F.asc("w")).limit(1000)
    wr = Window.orderBy(F.desc("cnt"), F.asc("w"))
    top = top1000.withColumn("r", F.row_number().over(wr))
    pts = top.select(
        F.floor(F.log(F.col("r").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(xd * xd).alias("_sxx"),
    ).select(
        F.col("_n").alias("n_tokens_fit"),
        (
            F.col("_n").cast("decimal(38,0)") * F.col("_sxy")
            - F.col("_sx") * F.col("_sy")
        )
        .cast("long")
        .alias("slope_num"),
        (
            F.col("_n").cast("decimal(38,0)") * F.col("_sxx")
            - F.col("_sx") * F.col("_sx")
        )
        .cast("long")
        .alias("slope_den"),
    )


@register(
    "path_markov_transitions",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts, event_type,
         SUM(new_session) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS to_type
  FROM sess
),
trans AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
tot AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS t
  FROM trans GROUP BY from_type
)
SELECT tr.from_type, tr.to_type, tr.n,
       CAST((1000000 * tr.n) // tot.t AS BIGINT) AS p_ppm
FROM trans tr JOIN tot USING (from_type)
""",
    doc="First-order Markov transition matrix over event types WITHIN "
    "30-minute sessions: counts and integer-ppm conditional "
    "probabilities P(next | current) — the behavioral model behind "
    "next-action prediction, funnel-leak diagnosis, and bot "
    "detection (bots have degenerate rows). Sessionization (gap "
    "flag -> running sum) and the lead() pairing run in the SAME "
    "per-user window pass — one fact-scale exchange, the trick "
    "path_top_trigrams pins — and cross-session transitions are "
    "excluded by partitioning the lead on (user, session). The "
    "transition table is type-vocabulary-bounded (<= |types|^2 "
    "rows), so the probability normalization joins tiny tables; "
    "floor-div ppm keeps every output BIGINT.",
)
def path_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull()  # timeless rows have no session
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(wu)
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(gap > 1800, 1).otherwise(0).alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    pairs = sess.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(ws).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("t"))
    return trans.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("CAST((1000000 * n) div t AS BIGINT)").alias("p_ppm"),
    )


@register(
    "samp_entity_split",
    oracle=f"""
WITH labeled AS (
  SELECT event_id, user_id,
         CASE WHEN {_bucket_sql("usersplit", "user_id")} < 8000
              THEN 'train'
              WHEN {_bucket_sql("usersplit", "user_id")} < 9000
              THEN 'val' ELSE 'test' END AS split
  FROM events
)
SELECT split,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM labeled GROUP BY split
""",
    doc="ENTITY-level train/val/test split: membership is hashed from "
    "the USER id, not the row, so every event of a user lands in the "
    "same split BY CONSTRUCTION — the third leg of the leakage-split "
    "triad (samp_cluster_split: near-dup content can't straddle; "
    "samp_temporal_embargo: label windows can't straddle; this: "
    "per-entity behavioral signal can't straddle — the requirement "
    "for any per-user model eval). Same salted-hash membership rule "
    "as samp_hash_split (partition/order-invariant, reproducible); "
    "the audit is one scan + a 3-group aggregate with per-split "
    "distinct users.",
)
def samp_entity_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")["events"]
    labeled = sampling.hash_split(
        e, F.col("user_id"), {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="usersplit",
    )
    return labeled.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


@register(
    "dq_fk_integrity",
    oracle="""
WITH checks AS (
  SELECT 'lineitem.l_orderkey->orders' AS edge,
         (SELECT count(*) FROM lineitem) AS n_child,
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey))
           AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p
                            WHERE p.p_partkey = l.l_partkey))
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM supplier s
                            WHERE s.s_suppkey = l.l_suppkey))
  UNION ALL
  SELECT 'orders.o_custkey->customer',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'customer.c_nationkey->nation',
         (SELECT count(*) FROM customer),
         (SELECT count(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = c.c_nationkey))
  UNION ALL
  SELECT 'supplier.s_nationkey->nation',
         (SELECT count(*) FROM supplier),
         (SELECT count(*) FROM supplier s
          WHERE NOT EXISTS (SELECT 1 FROM nation n
                            WHERE n.n_nationkey = s.s_nationkey))
  UNION ALL
  SELECT 'nation.n_regionkey->region',
         (SELECT count(*) FROM nation),
         (SELECT count(*) FROM nation n
          WHERE NOT EXISTS (SELECT 1 FROM region r
                            WHERE r.r_regionkey = n.n_regionkey))
)
SELECT edge, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_orphans AS BIGINT) AS n_orphans
FROM checks
""",
    doc="Referential-integrity audit of the WHOLE schema in one "
    "report: every FK edge of the star (7 edges) with child "
    "cardinality and orphan count — the load-gate every warehouse "
    "runs before publishing (the reference trusts its FKs "
    "implicitly; this makes the check a queryable operator). Each "
    "edge is a LEFT ANTI join against the parent's key set — parent "
    "keys are dimension-sized and broadcast for all edges except "
    "orders (fact-to-fact, shuffled); counts are map-side-combined "
    "scalars, so the report costs one pass per child table "
    "regardless of fact size. Zero orphans on this testdata by "
    "construction — the point is the operator, pinned green, so a "
    "real pipeline's regression shows as a nonzero cell.",
)
def dq_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(
        spark, sf_dir,
        "lineitem", "orders", "part", "supplier", "customer",
        "nation", "region",
    )

    def edge(name, child, ckey, parent, pkey, broadcast=True):
        # one rename here — callers pass the RAW parent + its key name
        pk = parent.select(F.col(pkey).alias(ckey)).distinct()
        if broadcast:
            pk = F.broadcast(pk)
        orphans = child.join(pk, ckey, "left_anti")
        return (
            child.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            )
            .select(
                F.lit(name).alias("edge"), "n_child", "n_orphans"
            )
        )

    parts = [
        edge("lineitem.l_orderkey->orders", t["lineitem"], "l_orderkey",
             t["orders"], "o_orderkey", broadcast=False),
        edge("lineitem.l_partkey->part", t["lineitem"], "l_partkey",
             t["part"], "p_partkey"),
        edge("lineitem.l_suppkey->supplier", t["lineitem"], "l_suppkey",
             t["supplier"], "s_suppkey"),
        edge("orders.o_custkey->customer", t["orders"], "o_custkey",
             t["customer"], "c_custkey"),
        edge("customer.c_nationkey->nation", t["customer"], "c_nationkey",
             t["nation"], "n_nationkey"),
        edge("supplier.s_nationkey->nation", t["supplier"], "s_nationkey",
             t["nation"], "n_nationkey"),
        edge("nation.n_regionkey->region", t["nation"], "n_regionkey",
             t["region"], "r_regionkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "w16_new_vs_returning",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM events
  WHERE ts IS NOT NULL
),
first_seen AS (
  SELECT user_id, min(day) AS first_day FROM activity GROUP BY user_id
),
daily AS (
  SELECT a.day,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN f.first_day = a.day THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new
  FROM activity a JOIN first_seen f USING (user_id)
  GROUP BY a.day
)
SELECT day, n_active, n_new,
       CAST(n_active - n_new AS BIGINT) AS n_returning,
       CAST(SUM(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM daily
""",
    doc="Daily growth curve: active, NEW (first-ever-seen today), "
    "returning, and cumulative acquired users — the "
    "acquisition-vs-retention decomposition behind every growth "
    "dashboard, and the complement of cohort_retention (which "
    "follows cohorts forward; this reads the same first-touch fact "
    "day by day). first_seen is one map-side-combined min per user; "
    "the per-user join back is user-vocabulary-sized; the cumulative "
    "sum is a single-partition window over the DAY-GRAIN rollup "
    "(the w11 pattern — O(days) rows). All integer epoch-day "
    "arithmetic.",
)
def w16_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = _t(spark, sf_dir, "events")["events"]
    activity = (
        e.filter(F.col("ts").isNotNull())  # ts-null fuzz
        .select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .distinct()
    )
    first_seen = activity.groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    daily = (
        activity.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(
                F.when(F.col("first_day") == F.col("day"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_new"),
        )
    )
    wc = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "n_active",
        "n_new",
        (F.col("n_active") - F.col("n_new")).cast("long").alias(
            "n_returning"
        ),
        F.sum("n_new").over(wc).cast("long").alias("cum_users"),
    )


@register(
    "ts_autocorrelation",
    oracle="""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
lags AS (SELECT unnest([1, 7]) AS lag),
pairs AS (
  SELECT l.lag, a.y AS ya, b.y AS yb
  FROM daily a
  JOIN lags l ON TRUE
  JOIN daily b ON b.day = a.day + l.lag
),
sums AS (
  SELECT lag,
         CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(ya) AS HUGEINT) AS sa,
         CAST(sum(yb) AS HUGEINT) AS sb,
         CAST(sum(CAST(ya AS HUGEINT) * yb) AS HUGEINT) AS sab,
         CAST(sum(CAST(ya AS HUGEINT) * ya) AS HUGEINT) AS saa,
         CAST(sum(CAST(yb AS HUGEINT) * yb) AS HUGEINT) AS sbb
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       CAST(n * sab - sa * sb AS BIGINT) AS corr_num,
       CAST(n * saa - sa * sa AS BIGINT) AS corr_den_a,
       CAST(n * sbb - sb * sb AS BIGINT) AS corr_den_b
FROM sums
""",
    doc="Lag-1 and lag-7 autocorrelation of daily order counts as "
    "EXACT RATIONALS: Pearson r over (y_t, y_t+k) pairs reported as "
    "(num, den_a, den_b) with r = num / sqrt(den_a * den_b) left to "
    "the caller — the num's SIGN and cross-lag comparisons via "
    "num^2 * den cross-multiplication need no float anywhere "
    "(a16_measure_correlation's pattern applied to the series "
    "against its own shift). A lag-7 peak is the weekly-seasonality "
    "detector that justifies ts_seasonal_baseline's weekday model. "
    "Pairing is an equi-join of the day-grain rollup with itself on "
    "day+k (absent days simply drop pairs — gap-filling composes "
    "upstream via ts_gapfill_daily); moments ride in "
    "DECIMAL(38,0)/HUGEINT, outputs BIGINT.",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    daily = (
        o.select(
            F.expr("unix_micros(o_orderdate) div 86400000000").alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    lags = spark.createDataFrame([(1,), (7,)], "lag long")
    a = daily.select("day", F.col("y").alias("ya"))
    b = daily.select(
        F.col("day").alias("bday"), F.col("y").alias("yb")
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("bday") == F.col("day") + F.col("lag"))
    )
    da = F.col("ya").cast("decimal(38,0)")
    db = F.col("yb").cast("decimal(38,0)")
    sums = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(da).alias("sa"),
        F.sum(db).alias("sb"),
        F.sum(da * db).alias("sab"),
        F.sum(da * da).alias("saa"),
        F.sum(db * db).alias("sbb"),
    )
    return sums.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
        .cast("long")
        .alias("corr_num"),
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
        .cast("long")
        .alias("corr_den_a"),
        (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
        .cast("long")
        .alias("corr_den_b"),
    )


@register(
    "sk_hist_merge",
    oracle="""
WITH v AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi, count(value) AS n
  FROM v GROUP BY 1
),
binned AS (
  SELECT v.event_type, b.lo, b.hi, b.n,
         CASE WHEN hi = lo THEN 0 ELSE
           least(CAST(floor((value - lo) / ((hi - lo) / 100)) AS BIGINT),
                 99) END AS bin
  FROM v JOIN bounds b USING (event_type)
),
counts AS (
  SELECT event_type, lo, hi, n, bin, count(*) AS c
  FROM binned GROUP BY 1, 2, 3, 4, 5
),
cum AS (
  SELECT event_type, lo, hi, n, bin, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cumc
  FROM counts
),
qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
SELECT event_type, q AS quantile,
       round(lo + min(bin) * (hi - lo) / 100, 4) AS value_est
FROM cum CROSS JOIN qs
WHERE cumc >= n * q
GROUP BY event_type, q, lo, hi
""",
    doc="Histogram MERGEABILITY, gate-proven: the engine builds the "
    "per-(type, bin) histogram as TWO independent partial histograms "
    "(event_id parity shards, sharing the same global bounds), "
    "merges them by bin-count SUM, and reads the quantiles from the "
    "merged cumulative — the oracle is the DIRECT one-pass "
    "histogram, so merge(hist(A), hist(B)) == hist(A ∪ B) is an "
    "oracle-checked identity, exactly like ivm_agg_merge for "
    "aggregates and sk_hll_set_algebra for HLL registers. This is "
    "the property that lets per-partition/per-day histogram files "
    "roll up into any date range without re-scanning — the bounds "
    "must be GLOBAL (per-shard bounds would misalign bins; the "
    "docstring names that trap). Costs one bounds pass + one "
    "bounded-cardinality partial agg per shard.",
)
def sk_hist_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")["events"]
    v = ev.filter(F.col("value").isNotNull())
    bounds = v.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("value").alias("n"),
    )
    width = (F.col("hi") - F.col("lo")) / 100
    binned = v.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo",
        "hi",
        "n",
        (F.col("event_id") % 2).alias("shard"),
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("lo")) / width).cast(
                    "long"
                ),
                F.lit(99),
            )
        )
        .alias("bin"),
    )
    partials = binned.groupBy(
        "event_type", "lo", "hi", "n", "shard", "bin"
    ).agg(F.count(F.lit(1)).alias("c"))
    merged = partials.groupBy("event_type", "lo", "hi", "n", "bin").agg(
        F.sum("c").alias("c")
    )
    cum = merged.withColumn(
        "cumc",
        F.sum("c").over(
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    qcol = F.explode(F.array(*[F.lit(q) for q in (0.5, 0.9, 0.99)]))
    return (
        cum.withColumn("quantile", qcol)
        .filter(F.col("cumc") >= F.col("n") * F.col("quantile"))
        .groupBy("event_type", "lo", "hi", "quantile")
        .agg(F.min("bin").alias("qbin"))
        .select(
            "event_type",
            "quantile",
            F.round(
                F.col("lo") + F.col("qbin") * (F.col("hi") - F.col("lo")) / 100,
                4,
            ).alias("value_est"),
        )
    )


@register(
    "q4_shipping_priority",
    oracle="""
WITH rev AS (
  SELECT l.l_orderkey,
         o.o_orderdate,
         o.o_orderpriority,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
              AS BIGINT) AS rev_cents
  FROM customer c
  JOIN orders o ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND l.l_shipdate > TIMESTAMP '1998-01-01'
)
SELECT l_orderkey,
       CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
       o_orderdate, o_orderpriority
FROM rev
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3-shape shipping-priority query on the OLTP side: "
    "BUILDING-segment customers, orders placed before the cutoff "
    "whose lines ship after it, top-10 open orders by outstanding "
    "revenue — the classic 3-way selective star probe, and the one "
    "reference-style benchmark shape the q1/q2/q3 pairs didn't "
    "cover (it exercises the previously-unused c_mktsegment "
    "attribute). Revenue is per-line "
    "round(extendedprice*(1-discount)*100) cents — one rounding of "
    "the identical double product on both engines, then pure BIGINT "
    "sums (the engine-wide cents contract). Plan: the segment "
    "filter prunes the customer dim BEFORE its broadcast; both date "
    "filters push to the scans; top-10 is TakeOrderedAndProject "
    "with the T4 (revenue DESC, key ASC) tie convention.",
)
def q4_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    o = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    ).select(
        "l_orderkey",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
        )
        .cast("long")
        .alias("rev_cents"),
    )
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .select(
            "l_orderkey", "revenue_cents", "o_orderdate", "o_orderpriority"
        )
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "dq_ks_drift",
    oracle=f"""
WITH labeled AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
         CASE WHEN {_bucket_sql("split", "o_orderkey")} < 8000
              THEN 'a' ELSE 'b' END AS side
  FROM orders
  WHERE o_totalprice IS NOT NULL
),
counts AS (
  SELECT c,
         CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT)
           AS na_c,
         CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT)
           AS nb_c
  FROM labeled GROUP BY c
),
tot AS (
  SELECT CAST(sum(na_c) AS BIGINT) AS na,
         CAST(sum(nb_c) AS BIGINT) AS nb
  FROM counts
),
cum AS (
  SELECT c,
         SUM(na_c) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(nb_c) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cb
  FROM counts
)
SELECT tot.na, tot.nb,
       CAST(max(abs(ca * tot.nb - cb * tot.na)) AS BIGINT) AS ks_num,
       CAST(tot.na * tot.nb AS BIGINT) AS ks_den
FROM cum CROSS JOIN tot
GROUP BY tot.na, tot.nb
""",
    doc="EXACT two-sample Kolmogorov-Smirnov drift statistic between "
    "the train-ish and held-out-ish slices of the price "
    "distribution: D = max |F_a - F_b| over the empirical CDFs, "
    "cross-multiplied to the pure-integer max |cum_a*n_b - "
    "cum_b*n_a| over n_a*n_b — the unbinned, binning-free "
    "complement of dq_psi_splits (PSI answers 'how much drift per "
    "bucket'; KS answers 'largest CDF gap anywhere', the classic "
    "accept/reject test statistic) with zero float CDFs. Plan: the "
    "fact collapses to per-VALUE side counts (map-side combined), "
    "then BOTH cumulative CDFs run through the two-pass banded "
    "running sum (packing.banded_running_sum, band = c div 2^20 ≈ "
    "$10k price slices) — for a near-continuous measure the value "
    "domain approaches O(rows), so the r6 full-domain window was a "
    "single-partition sort at 100x (VERDICT r6 #1); banded, each "
    "window partition holds only one price slice's distinct cents "
    "and the single-partition prefix touches the O(price_range / "
    "2^20) band table only. The max reduces to one row.",
)
def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from olist_data_warehouse_spark.operators.packing import (
        banded_running_sum,
    )

    o = _t(spark, sf_dir, "orders")["orders"]
    # An empirical CDF is over OBSERVED values — unpriced rows are
    # excluded on both sides (and with them the engines' divergent
    # NULL sort position in the cumulative window; null_fuzz_sweep).
    labeled = o.filter(F.col("o_totalprice").isNotNull()).select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c"),
        F.when(
            sampling.hash_bucket(F.col("o_orderkey"), "split") < 8000, "a"
        )
        .otherwise("b")
        .alias("side"),
    )
    counts = labeled.groupBy("c").agg(
        F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).alias("na_c"),
        F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).alias("nb_c"),
    )
    # c is non-null (price-filtered above), so the default loud NULL
    # contract of the banded primitives applies vacuously.
    cum = banded_running_sum(
        counts,
        band=F.expr("c div 1048576"),
        order_by=[F.asc("c")],
        sums={"ca": "na_c", "cb": "nb_c"},
    ).select("ca", "cb")
    tot = counts.agg(
        F.sum("na_c").alias("na"), F.sum("nb_c").alias("nb")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.max(
                F.abs(
                    F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")
                )
            )
            .cast("long")
            .alias("ks_num"),
            F.min(F.col("na") * F.col("nb")).cast("long").alias("ks_den"),
        )
        .select("na", "nb", "ks_num", "ks_den")
    )


@register(
    "pack_balanced_shards",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
sized AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens
  FROM tok WHERE len(toks) > 0
),
ranked AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rk
  FROM sized
),
assigned AS (
  SELECT doc_id, n_tokens, (rk - 1) % 16 AS shard FROM ranked
),
loads AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS tok_total
  FROM assigned GROUP BY shard
),
tot AS (SELECT CAST(sum(tok_total) AS BIGINT) AS t FROM loads)
SELECT shard, n_docs, tok_total,
       CAST((1000000 * 16 * tok_total) // t AS BIGINT) AS load_ppm_of_mean
FROM loads CROSS JOIN tot
""",
    doc="Balanced shard packing by LPT round-robin: documents ranked "
    "by token count DESC and dealt (rank-1) mod W into W=16 shards — "
    "the deterministic, fully-declarative form of longest-processing-"
    "time-first scheduling that keeps training-shard files near-"
    "uniform (big docs spread first, small docs fill the gaps; "
    "sequential greedy least-loaded packing does not distribute). "
    "The report shows per-shard doc count, token load, and the load "
    "as ppm of the perfectly-even mean via integer cross-"
    "multiplication (1e6·W·load div total — 1e6 = exactly even). "
    "Complements pack_concat_chunks (WITHIN-shard layout) with the "
    "ACROSS-shard assignment. One size rollup + one DISTRIBUTED rank "
    "over O(docs) (doc_id, n_tokens) pairs: the global "
    "ROW_NUMBER is the two-pass range-banded rank "
    "(packing.banded_global_rank — band on -(n_tokens div 16), rank "
    "within band, offset by broadcast per-band counts), so no "
    "single-partition window ever sees the doc table; at 100 TB the "
    "rank runs on the size table, never the text.",
)
def pack_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from olist_data_warehouse_spark.operators.packing import (
        banded_global_rank,
    )

    d = _t(spark, sf_dir, "documents")["documents"]
    sized = d.select(
        "doc_id", textops.token_count("text").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    # Band is monotone in the DESC sort key: -(n div 16) ascends as
    # n_tokens descends, so the banded rank equals the global rank.
    ranked = banded_global_rank(
        sized,
        band=F.expr("-(n_tokens div 16)"),
        order_by=[F.desc("n_tokens"), F.asc("doc_id")],
    )
    assigned = ranked.select(
        "doc_id",
        "n_tokens",
        ((F.col("rk") - 1) % 16).alias("shard"),
    )
    loads = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tok_total"),
    )
    tot = loads.agg(F.sum("tok_total").alias("t"))
    return loads.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "tok_total",
        F.expr(
            "CAST((1000000 * 16 * tok_total) div t AS BIGINT)"
        ).alias("load_ppm_of_mean"),
    )


@register(
    "a29_gini_concentration",
    oracle="""
WITH cents AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS c
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY o_custkey
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, o_custkey) AS i
  FROM cents
),
sums AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(c) AS HUGEINT) AS s,
         CAST(sum(CAST(i AS HUGEINT) * c) AS HUGEINT) AS si
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(s AS BIGINT) AS total_cents,
       CAST(2 * si - (n + 1) * s AS BIGINT) AS gini_num,
       CAST(n * s AS BIGINT) AS gini_den
FROM sums
""",
    doc="Gini coefficient of per-customer revenue concentration as an "
    "EXACT RATIONAL: G = (2·Σ i·x_i − (n+1)·Σx_i) / (n·Σx_i) over "
    "rank-ordered customer totals — the whale-concentration / "
    "inequality metric behind 'top 1% of customers drive X%' "
    "analyses, with zero floats (the rank-weighted sum replaces the "
    "Lorenz-curve integral exactly). Ordering ties break by customer "
    "key, which leaves G unchanged (equal values commute in the "
    "formula) but pins both engines to identical i·x_i terms. Plan: "
    "per-customer rollup (map-side combined), then the DISTRIBUTED "
    "two-pass range-banded rank (packing.banded_global_rank, band = "
    "c div 2^23 ≈ $84k revenue slices) over the CUSTOMER-grain "
    "table — no single-partition window even at 10^8 customers — "
    "and a 1-row moment reduce; i·x_i rides in 128-bit "
    "intermediates.",
)
def a29_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from olist_data_warehouse_spark.operators.packing import (
        banded_global_rank,
    )

    o = _t(spark, sf_dir, "orders")["orders"]
    # Concentration is over OBSERVED revenue: unpriced orders carry no
    # amount on either engine (SUM skips NULL), and a customer whose
    # EVERY order is unpriced has no observed revenue at all — without
    # this filter their c is NULL, whose band would otherwise vanish
    # in the banded rank's offset join while the oracle ranks it
    # NULLS LAST (ADVICE r6). banded_global_rank now also raises on
    # NULL bands rather than dropping, so this contract is enforced.
    cents = (
        o.filter(F.col("o_totalprice").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("c")
        )
    )
    ranked = banded_global_rank(
        cents,
        band=F.expr("c div 8388608"),
        order_by=[F.asc("c"), F.asc("o_custkey")],
        rank_name="i",
    ).select("c", "i")
    cd = F.col("c").cast("decimal(38,0)")
    idx = F.col("i").cast("decimal(38,0)")
    sums = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(cd).alias("s"),
        F.sum(idx * cd).alias("si"),
    )
    return sums.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("s").cast("long").alias("total_cents"),
        (2 * F.col("si") - (F.col("n") + 1) * F.col("s"))
        .cast("long")
        .alias("gini_num"),
        (F.col("n") * F.col("s")).cast("long").alias("gini_den"),
    )


@register(
    "a31_lorenz_deciles",
    oracle="""
WITH cents AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS c
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY o_custkey
),
tiled AS (
  SELECT c, NTILE(10) OVER (ORDER BY c, o_custkey) AS decile
  FROM cents
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM tiled)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(c) AS BIGINT) AS cents_total,
       CAST((1000000 * sum(c)) // tot.t AS BIGINT) AS share_ppm
FROM tiled CROSS JOIN tot
GROUP BY decile, tot.t
""",
    doc="The Lorenz curve behind a29_gini_concentration, as a decile "
    "table: customers ranked by revenue into NTILE(10) buckets, each "
    "decile's customer count, cents total, and integer-ppm share of "
    "all revenue — the 'top decile drives X%' readout executives "
    "actually consume, where the Gini is the one-number summary. "
    "NTILE is deterministic here because the ordering (c, custkey) "
    "is unique, and both engines use the same NTILE remainder "
    "convention (larger buckets first) — pinned by the gate. Plan: "
    "customer-grain rollup, the DISTRIBUTED two-pass range-banded "
    "rank (packing.banded_global_rank), then NTILE recovered "
    "arithmetically from (rank, n): with q = n div 10, r = n mod "
    "10, the first r buckets hold q+1 rows — so no NTILE window "
    "(single-partition by definition) touches the customer table; "
    "1-row total broadcast, floor-div ppm.",
)
def a31_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from olist_data_warehouse_spark.operators.packing import (
        banded_global_rank,
    )

    o = _t(spark, sf_dir, "orders")["orders"]
    # Observed-revenue contract — same as a29_gini_concentration: an
    # all-NULL-price customer has no observed revenue; without the
    # filter their NULL c would vanish in the banded rank's offset
    # join while the oracle NTILEs it NULLS LAST (ADVICE r6).
    cents = (
        o.filter(F.col("o_totalprice").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("c")
        )
    )
    ranked = banded_global_rank(
        cents,
        band=F.expr("c div 8388608"),
        order_by=[F.asc("c"), F.asc("o_custkey")],
        rank_name="i",
    )
    n_row = ranked.agg(F.count(F.lit(1)).alias("n"))
    # NTILE(10) from the exact rank: q=n div 10, r=n mod 10; the
    # first r buckets take q+1 rows (Spark's and DuckDB's shared
    # larger-buckets-first convention), the rest take q.
    j = F.col("i") - 1
    q = F.expr("n div 10")
    r = F.col("n") % 10
    decile = F.when(
        j < r * (q + 1), F.floor(j / (q + 1)) + 1
    ).otherwise(r + F.floor((j - r * (q + 1)) / q) + 1)
    tiled = ranked.crossJoin(F.broadcast(n_row)).select(
        "c", decile.cast("int").alias("decile")
    )
    tot = tiled.agg(F.sum("c").alias("t"))
    return (
        tiled.crossJoin(F.broadcast(tot))
        .groupBy("decile", "t")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c").alias("cents_total"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_customers",
            "cents_total",
            F.expr(
                "CAST((1000000 * cents_total) div t AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Importance resampling (DSIR)
# ---------------------------------------------------------------------------


@register(
    "samp_dsir_importance",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
words AS (SELECT doc_id, lang, unnest(toks) AS word FROM tok),
w AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(word), 1, 8))::BIGINT % 64 AS b
  FROM words WHERE word != ''
),
spine AS (SELECT unnest(generate_series(0, 63)) AS b),
c AS (
  SELECT s.b,
         CAST(COALESCE(SUM(CASE WHEN w.lang = 'en' THEN 1 END), 0) + 1
              AS BIGINT) AS a,
         CAST(COUNT(w.b) + 1 AS BIGINT) AS r
  FROM spine s LEFT JOIN w ON w.b = s.b
  GROUP BY s.b
),
t AS (SELECT CAST(SUM(a) AS BIGINT) AS ta, CAST(SUM(r) AS BIGINT) AS tr
      FROM c),
sc AS (
  SELECT c.b,
         CAST(floor(1000000.0 * ln(
             CAST(GREATEST((1000000 * c.a) // t.ta, 1) AS DOUBLE) /
             GREATEST((1000000 * c.r) // t.tr, 1))) AS BIGINT)
           AS score_micro
  FROM c CROSS JOIN t
),
dc AS (SELECT doc_id, b, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
dw AS (
  SELECT dc.doc_id,
         CAST(SUM(dc.cnt * sc.score_micro) AS BIGINT) AS weight_micro
  FROM dc JOIN sc ON sc.b = dc.b
  GROUP BY dc.doc_id
)
SELECT doc_id, weight_micro FROM dw WHERE weight_micro > 0
""",
    doc="Importance resampling for target-domain data selection — the "
    "public DSIR recipe (Xie et al., 'Data Selection for Language "
    "Models via Importance Resampling', NeurIPS 2023) with this "
    "repo's determinism discipline. Features are hashed word unigrams "
    "(portable 32-bit hash mod 64 buckets); target (lang='en') and "
    "raw bag-of-buckets models get add-one smoothing over the full "
    "bucket spine; per-bucket log-likelihood ratios follow the "
    "PSI/BM25 precedent — shares in floor-div ppm clamped >= 1, ONE "
    "ln per BUCKET floored to micro-nats — so each document's "
    "importance weight is an exact BIGINT dot product (token-bucket "
    "counts x bucket scores) and selection (weight > 0: more "
    "target-like than the raw average) is engine-exact, no float "
    "boundary can flip membership. Scale shape: the 64-row bucket "
    "model is a broadcast; the heavy operations are one token-bucket "
    "shuffle bounded by |docs| x 64 partial-aggregated rows and a "
    "map-side dot product. At 100 TB this runs once per target domain "
    "to score the whole raw corpus; the paper's Gumbel top-k variant "
    "swaps the deterministic threshold for a seeded-noise threshold "
    "on the same weights.",
)
def samp_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    n_buckets = 64
    w = (
        d.select(
            "doc_id",
            "lang",
            F.explode(textops.tokens("text")).alias("word"),
        )
        .filter(F.col("word") != "")
        .select(
            "doc_id",
            "lang",
            (textops.portable_hash32("word") % n_buckets).alias("b"),
        )
    )
    spine = spark.range(n_buckets).select(F.col("id").alias("b"))
    c = (
        spine.join(w, "b", "left")
        .groupBy("b")
        .agg(
            (
                F.coalesce(
                    F.sum(F.when(F.col("lang") == "en", 1)), F.lit(0)
                )
                + 1
            )
            .cast("long")
            .alias("a"),
            (F.count("doc_id") + 1).cast("long").alias("r"),
        )
    )
    t = c.agg(
        F.sum("a").cast("long").alias("ta"),
        F.sum("r").cast("long").alias("tr"),
    )
    sc = c.crossJoin(F.broadcast(t)).select(
        "b",
        F.floor(
            F.lit(1000000.0)
            * F.log(
                F.greatest(
                    F.expr("(1000000 * a) div ta"), F.lit(1).cast("long")
                ).cast("double")
                / F.greatest(
                    F.expr("(1000000 * r) div tr"), F.lit(1).cast("long")
                )
            )
        )
        .cast("long")
        .alias("score_micro"),
    )
    dc = w.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("cnt"))
    dw = (
        dc.join(F.broadcast(sc), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("score_micro"))
            .cast("long")
            .alias("weight_micro")
        )
    )
    return dw.where(F.col("weight_micro") > 0)


# ---------------------------------------------------------------------------
# Trained residual PQ codebooks (Jegou et al. 2011 IVF-PQ training)
# ---------------------------------------------------------------------------

# Per-subspace Lloyd assignment over residual slices vs codebook {bk}:
# identical left-fold double arithmetic on both engines, ties by code.
_PQ_ASSIGN_SQL = """
SELECT * FROM (
  SELECT s.vec_id, s.centroid_id, s.m, s.rs, b.code,
         ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
           list_reduce(list_prepend(0.0,
             list_transform(generate_series(1, 16),
               j -> (s.rs[j] / 1000000.0 - b.cw[j])
                  * (s.rs[j] / 1000000.0 - b.cw[j]))),
             (a, x) -> a + x),
           b.code) AS rn
  FROM slices s JOIN {bk} b ON s.m = b.m
) WHERE rn = 1
""".strip()

_PQ_UPDATE_SQL = """
SELECT m, code, list(s / n / 1000000.0 ORDER BY d) AS cw FROM (
  SELECT m, code, j.j AS d, sum(rs[j.j]) AS s, count(*) AS n
  FROM {asg} CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS j) j
  GROUP BY 1, 2, 3
) GROUP BY 1, 2
""".strip()


@register(
    "sim_pq_trained_encode",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qe
  FROM embeddings
),
cents AS (SELECT vec_id AS centroid_id, qe AS qc FROM q WHERE vec_id < 8),
asg AS (
  SELECT vec_id, centroid_id,
         list_transform(generate_series(1, 64), j -> qe[j] - qc[j]) AS r
  FROM (
    SELECT q.vec_id, q.qe, c.centroid_id, c.qc,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(generate_series(1, 64),
                 j -> (q.qe[j] - c.qc[j]) * (q.qe[j] - c.qc[j]))),
               (a, x) -> a + x),
             c.centroid_id) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn = 1
),
slices AS (
  SELECT vec_id, centroid_id, m.m,
         list_slice(r, m.m * 16 + 1, m.m * 16 + 16) AS rs
  FROM asg CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS m) m
),
b0 AS (
  SELECT m, CAST(vec_id - 8 AS INTEGER) AS code,
         list_transform(rs, v -> v / 1000000.0) AS cw
  FROM slices WHERE vec_id >= 8 AND vec_id < 16
),
a1 AS ({_PQ_ASSIGN_SQL.format(bk="b0")}),
b1 AS ({_PQ_UPDATE_SQL.format(asg="a1")}),
a2 AS ({_PQ_ASSIGN_SQL.format(bk="b1")}),
b2 AS ({_PQ_UPDATE_SQL.format(asg="a2")}),
a3 AS ({_PQ_ASSIGN_SQL.format(bk="b2")})
SELECT vec_id, max(centroid_id) AS centroid_id,
       max(CASE WHEN m = 0 THEN code END) AS code_0,
       max(CASE WHEN m = 1 THEN code END) AS code_1,
       max(CASE WHEN m = 2 THEN code END) AS code_2,
       max(CASE WHEN m = 3 THEN code END) AS code_3
FROM a3 GROUP BY vec_id
""",
    doc="TRAINED product-quantization codebooks over coarse-quantizer "
    "residuals — the full IVF-PQ training recipe (Jegou, Douze & "
    "Schmid, TPAMI 2011), upgrading the retrieval stack's seeded "
    "codebooks to Lloyd-trained ones: exact-integer coarse assignment "
    "on 1e-6 fixed-point vectors, BIGINT residuals, two Lloyd rounds "
    "per subspace over residual slices (broadcast M*K codewords; "
    "update = bounded M*K*16 exact-integer partial aggregate), final "
    "encode against the trained books. The fixed-point discipline "
    "(sim_kmeans_refine's) makes the whole iterative pipeline bit-"
    "reproducible, so the DuckDB oracle replays training verbatim and "
    "the ENCODING hash-matches. Codebook seeds are the vectors after "
    "the IVF seeds (whose residuals are identically zero — seeding "
    "from them collapses Lloyd). At 100 TB the corpus is scanned once "
    "per round against broadcast model parameters; nothing wider than "
    "M*K*sub integer sums aggregates, and the corpus never self-joins.",
)
def sim_pq_trained_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    _books, encoded = similarity.pq_train_residual_codebooks(
        e, n_subspaces=4, n_codes=8, n_centroids=8, iters=2
    )
    return encoded


@register(
    "dedup_decontaminate",
    oracle=f"""
WITH {SQL_NORM_TOKENS},
{SQL_SHINGLES},
shh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(shingle), 1, 8))::BIGINT % 2147483647 AS h
  FROM sh
),
bench AS (SELECT DISTINCT h FROM shh WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, h FROM shh WHERE doc_id % 97 <> 0),
sizes AS (SELECT doc_id, count(h) AS set_size FROM train GROUP BY doc_id),
hits AS (
  SELECT t.doc_id, count(t.h) AS n_overlap
  FROM train t JOIN bench b ON t.h = b.h
  GROUP BY t.doc_id
)
SELECT h.doc_id, h.n_overlap, s.set_size,
       round(h.n_overlap / CAST(s.set_size AS DOUBLE), 4)
         AS overlap_ratio
FROM hits h JOIN sizes s ON s.doc_id = h.doc_id
""",
    doc="TRAIN-SET DECONTAMINATION against a held-out benchmark (the "
    "GPT-3 Appendix-C / C4-analysis recipe, Brown et al. 2020; Dodge "
    "et al. 2021): every 97th document plays the eval set, the rest "
    "is the training corpus, and any train doc sharing a 3-word "
    "shingle with any benchmark doc is flagged with its overlap "
    "evidence (distinct contaminated shingle-hash count, shingle-set "
    "size, ratio). The benchmark side reduces to DISTINCT shingle "
    "HASHES and broadcasts — real eval suites are megabytes against "
    "a 100 TB train corpus, so contamination screening is one "
    "map-side semi join where the train text never moves; the flagged "
    "list then drives a drop or a manual audit. Same md5-based "
    "portable hash family as the whole shingle operator family, so "
    "the oracle states the identical computation relationally.",
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    bench = d.where(F.col("doc_id") % 97 == 0)
    train = d.where(F.col("doc_id") % 97 != 0)
    return dedup.decontaminate(train, bench, k=3)
