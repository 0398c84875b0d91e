"""Host-side utilities: audio I/O, model download/cache."""
