"""Writers: partitioned parquet, CSV export, table overwrite/append."""
