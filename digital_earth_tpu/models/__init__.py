"""Physical models: atmospheric volume scattering and the Earth surface BRDF."""
