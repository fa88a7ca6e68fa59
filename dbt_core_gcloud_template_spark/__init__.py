"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference dbt-on-BigQuery template
(jasonbhart/dbt-core-gcloud-template), re-expressed Spark-first.

Layers (mirrors SURVEY.md):
  - ``plans``     : project loader, Jinja compiler, manifest DAG, runner
                    (the dbt-semantics engine: build/test/snapshot/seed).
  - ``sources``   : table registration (parquet, CSV seeds, catalog).
  - ``operators`` : data-diff, schema-diff, SCD2 snapshots, tests,
                    freshness, dedup, similarity search, multimodal.
  - ``functions`` : portable deterministic hashing + text analysis
                    primitives (shared semantics with the DuckDB oracle).
  - ``streaming`` : Structured Streaming operators over the events table.
  - ``queries``   : the registry exposed through ``__spark_entry__``.

Everything is built on the public PySpark DataFrame/SQL API; Catalyst +
AQE do the physical planning. No code is copied from the reference.
"""

__version__ = "0.1.0"
