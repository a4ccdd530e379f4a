"""Multi-chip scaling: device meshes, sharded render steps, ICI collectives."""
