"""Planning layer: deterministic vector-query workload derivation,
selectivity-based routing, interval decomposition."""
