"""Source layer: parquet catalog + bulk-table reader (merge-on-read)."""
