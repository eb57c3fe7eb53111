"""data_pipeline_demo_spark — a PySpark-native analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
reference `Advanced-Payment-Solutions/data-pipeline-demo` (a single-process
pandas ETL job, see SURVEY.md), re-expressed Spark-first:

- DataFrame/SQL logical plans, Catalyst/AQE physical planning,
  whole-stage codegen — never RDDs in the hot path.
- Explicit schemas at every ingest boundary; declarative cast specs for the
  reference's messy money/datetime columns.
- Full relational surface (joins, aggregates, windows, set ops) the
  reference lacks, each oracle-checked against DuckDB.
- LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text analysis, multimodal
  binary-column plumbing — designed for 100 TB scale (broadcast small
  sides, LSH instead of cross joins, salting for skew).
"""

__version__ = "0.1.0"
