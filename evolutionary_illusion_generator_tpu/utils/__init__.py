"""Utilities: image IO, flow overlays, timing/profiling helpers."""
