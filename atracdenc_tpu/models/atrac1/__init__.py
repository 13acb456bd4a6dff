"""ATRAC1 codec: 512-sample frames, 3 QMF bands, 212-byte sound units."""
