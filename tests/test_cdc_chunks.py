"""Content-defined chunking: the insertion-robustness property that
motivates CDC over fixed-width spans, plus boundary-rule invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from olist_data_warehouse_spark.operators import dedup


def _chunks_of(spark, text: str, doc_id: int = 0, divisor: int = 16):
    df = spark.createDataFrame([(doc_id, text)], "doc_id bigint, text string")
    rows = dedup.cdc_chunks(df, divisor=divisor).collect()
    return [r.chunk for r in sorted(rows, key=lambda r: r.idx)]


def test_chunks_reassemble_to_the_document(spark):
    """Chunking is a partition: concatenating the chunks in order
    reproduces the normalized token stream exactly."""
    text = "the quick brown fox jumps over the lazy dog " * 20
    chunks = _chunks_of(spark, text)
    assert " ".join(chunks) == " ".join(text.lower().split())


def test_insertion_redraws_only_the_touched_chunk(spark):
    """THE CDC property: inserting one word near the front changes at
    most the chunks up to the next boundary; every chunk after it
    realigns byte-identically. A fixed-width chunker shifts every
    subsequent span (verified as the contrast)."""
    import itertools

    base_words = [f"w{i % 97}x{i % 13}" for i in range(400)]
    orig = " ".join(base_words)
    edited = " ".join(base_words[:3] + ["inserted"] + base_words[3:])

    a = _chunks_of(spark, orig, 1)
    b = _chunks_of(spark, edited, 2)
    shared = set(a) & set(b)
    # every chunk strictly after the edited region survives verbatim
    assert set(a[2:]) <= shared.union(set(a[:2]))
    assert len(shared) >= len(a) - 2

    # contrast: fixed 8-word spans lose ALL alignment after the insert
    def spans(words):
        return [
            " ".join(words[i : i + 8])
            for i in range(0, len(words) - 7, 8)
        ]

    sa = spans([w.lower() for w in base_words])
    sb = spans([w.lower() for w in base_words[:3] + ["inserted"] + base_words[3:]])
    assert len(set(sa) & set(sb)) <= 1  # at most the untouched first span


def test_boundary_rule_is_deterministic_and_divisor_scales_chunks(spark):
    """Same text -> same chunks (pure function); a smaller divisor
    yields more, shorter chunks on average."""
    text = " ".join(f"tok{i % 211}" for i in range(600))
    c16a = _chunks_of(spark, text, divisor=16)
    c16b = _chunks_of(spark, text, divisor=16)
    assert c16a == c16b
    c4 = _chunks_of(spark, text, divisor=4)
    assert len(c4) > len(c16a)
