"""Decode engine: vectorized CTC prefix scoring + blockwise synchronous beam search."""
