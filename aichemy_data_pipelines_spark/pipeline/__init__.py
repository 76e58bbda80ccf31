"""Spark-native watch→convert→archive→verify pipeline (reference DAG
parity at the filesystem level — see pipeline/batch.py)."""
