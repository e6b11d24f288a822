"""olist_data_warehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference data warehouse (ericborn/Olist-Data-Warehouse: a Kimball
star-schema DW over the Olist e-commerce dataset, built with T-SQL +
SSIS; see SURVEY.md). Nothing here is a port: the reference tells us
WHAT to compute — dimension/fact builds, anti-join incremental loads,
top-N analytics — and we express it as Catalyst-optimizable DataFrame /
Spark SQL plans designed for a multi-executor cluster at 100 TB scale.

Layout
------
- ``session``    SparkSession builder (AQE, shuffle sizing, UTC).
- ``schemas``    explicit StructTypes for every table (schema-on-write).
- ``functions``  T-SQL-exact scalar semantics + surrogate keys.
- ``sources``    readers/writers (CSV/Parquet/tables; CTAS, append,
                 delete-rewrite — the reference's S1-S11 surface).
- ``operators``  relational building blocks + the extended LLM-pipeline
                 operators (dedup, similarity search, text analysis,
                 multimodal plumbing).
- ``plans``      the warehouse build DAG, incremental load, and the
                 query registry consumed by ``__spark_entry__``.
- ``streaming``  Structured Streaming form of the incremental load.
"""

__version__ = "0.1.0"
