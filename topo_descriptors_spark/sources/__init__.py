"""Sources & sinks: parquet (Iceberg-ready) IO and deterministic
synthetic fixture generators (FIXTURES.md F2-F5)."""
