"""Sources & sinks: parquet catalog (catalog.py), generic format
readers/writers and bucketed tables (formats.py), incremental file
discovery (the pipeline package)."""
