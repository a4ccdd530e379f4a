"""Assets: spectral LUT loading, texture loading, and procedural fallbacks."""
