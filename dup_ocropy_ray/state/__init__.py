"""Checkpoint / lineage / resume state."""
