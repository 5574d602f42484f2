"""Engine operators: index build, BM25 search, dedup, similarity, text stats."""
