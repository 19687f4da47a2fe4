"""Composed Ray Data pipelines (read → stages → write)."""
