"""Rendering: wavefront path tracer, camera, film chain, renderer orchestration."""
