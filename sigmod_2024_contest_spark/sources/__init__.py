"""Sources & sinks: parquet table loaders, the reference's raw .bin
format (converter + decoder), sorted-replica prep jobs, and index
(graph) persistence."""
