"""Sources & sinks: HTTP ingestion and partitioned parquet I/O."""
