"""Engine operators: spatial join, kNN, aggregation kernels, windows,
dedup, similarity, text analysis, multimodal plumbing."""
