"""weather_etl_pipeline_spark — PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``Prafful-Vyas/Weather-ETL-Pipeline`` (a DuckDB-backed
medallion-lakehouse ETL), re-expressed Spark-first: declarative DataFrame/SQL
plans optimized by Catalyst, partitioned Parquet I/O with dynamic partition
overwrite, metadata-driven incremental processing, plus the LLM-data-pipeline
extension surface (dedup, similarity search, text analysis, multimodal
plumbing) designed for 100 TB scale.

Package map (SURVEY.md section 7):

- ``session``    SparkSession factory with scale-aware defaults
- ``schemas``    declared StructTypes (weather zones + driver test tables)
- ``catalog``    table loading/registration over the test parquet
- ``sources``    HTTP ingestion (mockable) and partitioned parquet I/O
- ``plans``      incremental work-list, metadata upsert, layer runners
- ``operators``  relational / join / window / dedup / simsearch / text / json
- ``functions``  reusable column expressions (datetime, vectors, hashing)
- ``streaming``  event-time windows (batch-checkable + streaming variants)
"""

__version__ = "0.1.0"
