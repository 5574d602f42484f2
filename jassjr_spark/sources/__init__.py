"""Sources & sinks: TREC-XML ingestion/rendering, Parquet index store."""
