"""Structured Streaming twins of the batch pipeline (watch.py)."""
