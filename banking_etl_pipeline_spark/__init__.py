"""banking_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference `quangdvn/banking-etl-pipeline` (see SURVEY.md), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, columnar
parquet IO, single-pass data-quality aggregates, window metrics, and — beyond
reference parity — large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout:
    session.py     SparkSession factory (env-parameterized, AQE on)
    catalog.py     test-table catalog over /root/testdata/sf*/
    sources/       csv/parquet/text/jdbc/delta readers (reference §2.1)
    operators/     relational core, windows, quality, dedup, similarity, text
    functions/     scalar/vector column-expression helpers
    plans/         config-driven pipeline orchestration (reference §2.8)
    streaming/     Structured Streaming variants of the window metrics
    registry.py    query-key → (spark builder, duckdb oracle SQL)
"""

__version__ = "0.1.0"
