"""Relational building blocks + LLM-data-pipeline operators.

The reference's operator surface is purely relational (SURVEY.md §2);
these modules add the training-data-pipeline operators the engine is
sized for at 100 TB: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search (brute-force and IVF cosine),
text analysis (lang-ID, quality, tokens, fingerprints), and multimodal
column plumbing. Everything stays in Catalyst built-ins except the
explicitly-marked Pandas-UDF paths.
"""
