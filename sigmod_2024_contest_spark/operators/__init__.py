"""Physical operators: exact/approximate filtered kNN, quantized
brute force + re-rank, stats/routing, HNSW build & search, dedup,
similarity search, multimodal plumbing, relational demos."""
