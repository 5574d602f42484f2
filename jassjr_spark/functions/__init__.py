"""Vectorized (Arrow-batched) column functions: tokenization, compression."""
