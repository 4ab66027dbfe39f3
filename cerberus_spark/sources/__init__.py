"""Sources: synthetic transcript generation + table IO (parquet now,
Iceberg behind an import-try when its runtime jars are present)."""
