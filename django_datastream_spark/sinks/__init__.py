"""Sink-side writers (training-corpus export)."""
