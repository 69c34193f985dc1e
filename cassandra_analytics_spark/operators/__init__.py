"""Custom operators: Cassandra-read semantics (LWW merge, tombstone purge,
static columns), dedup family, similarity search, text analysis, partition
statistics. Each composes built-in DataFrame operators — no Python row loops."""
