"""Utilities: frame timing/metrics, render-state checkpointing helpers."""
