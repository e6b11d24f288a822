"""Query lifecycle layer: warehouse build DAG, incremental load, registry."""
