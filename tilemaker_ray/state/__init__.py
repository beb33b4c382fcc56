"""Checkpoint / lineage state for resumable runs."""
