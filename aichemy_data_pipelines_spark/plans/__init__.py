"""Physical-plan inspection helpers (explain.py)."""
