"""Corpus-level text statistics: unigram LM scoring and TF-IDF terms.

Unlike ``operators/textops.py`` (pure per-row column expressions),
these need corpus-wide state — token frequencies, document frequencies
— so each is one or two aggregates joined back to the token stream.

Portability discipline (the reason these look slightly unusual):

- Per-document scores are **sums of BIGINTs**, never sums of doubles:
  cross-engine double summation drifts with partial-aggregation order.
  The unigram log-probability is quantized to integer micro-nats per
  *distinct* (token, count) BEFORE the per-doc sum, so the only
  transcendental (``ln``) is evaluated once per vocabulary entry on
  identical integer arguments in both engines.
- TF-IDF uses the *linear* inverse frequency ``tf · N / df`` — one
  correctly-rounded IEEE division, bit-identical everywhere — rather
  than the log-damped ``tf · ln(N/df)`` whose last-ulp behavior is
  libm-dependent. At 100 TB the ranking this produces per document is
  the same monotone order for fixed tf (both are decreasing in df);
  swap in the log form when cross-engine reproducibility isn't a
  requirement.

The 100 TB shapes: token frequency and document frequency are
map-side-combinable groupBys over the exploded token stream (shuffle
carries (token, partial count), not tokens); the frequency table joins
back by token — a plain hash join whose build side is vocabulary-sized,
dwarfed by the corpus; the per-doc reduce is one more partial-agg
groupBy. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from olist_data_warehouse_spark.operators import textops

# Quantization for log-probabilities: micro-nats, floored to BIGINT.
LOGPROB_SCALE = 1_000_000


def _token_stream(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, token) with empty tokens dropped (multiplicity kept)."""
    return docs.select(
        "doc_id", F.explode(textops.tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, neg_logprob): average per-token negative log
    probability under the corpus's own unigram distribution — the
    classic perplexity-proxy quality score (high = surprising/rare
    tokens, low = common fluent text).

    Each token's −ln(count/total) is floored to integer micro-nats
    first; the per-doc aggregate is then an exact BIGINT sum divided
    once at the end.
    """
    toks = _token_stream(docs, text_col)
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("tot"))
    lp = freq.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(
            -F.log(F.col("cnt").cast("double") / F.col("tot"))
            * LOGPROB_SCALE
        ).alias("lp_micro"),
    )
    return (
        toks.join(lp, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp_micro").alias("_lp_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("_lp_sum") / F.col("n_tokens") / LOGPROB_SCALE, 4
            ).alias("neg_logprob"),
        )
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-``k`` characteristic terms per document by ``tf · N / df``
    (linear idf — see module docstring), deterministically tiebroken
    by term. Returns (doc_id, term, tf, df, score).
    """
    toks = _token_stream(docs, text_col)
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.count_distinct(F.col("doc_id")).alias("n_docs")
    )
    scored = tf.join(df_, "token").crossJoin(F.broadcast(n_docs)).select(
        "doc_id",
        F.col("token").alias("term"),
        "tf",
        "df",
        (F.col("tf") * F.col("n_docs") / F.col("df")).alias("_s"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("_s"), F.asc("term")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("doc_id", "term", "tf", "df", F.round("_s", 4).alias("score"))
    )


def corpus_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-(lang, source) corpus inventory: document counts, token and
    character totals, token-length mean — the summary a curation run
    reports before/after each filter stage.

    One map-side-combinable groupBy; every aggregate is an exact
    integer sum (the mean is a single end division), so the profile is
    engine-reproducible and cheap at any scale.
    """
    per_doc = docs.select(
        "lang",
        "source",
        textops.token_count(text_col).alias("_nt"),
        F.length(F.col(text_col)).cast("long").alias("_nc"),
    )
    return (
        per_doc.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
            F.sum("_nc").alias("total_chars"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            F.round(F.col("total_tokens") / F.col("n_docs"), 4).alias(
                "avg_tokens"
            ),
        )
    )
