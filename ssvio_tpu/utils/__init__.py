"""Utility subsystems: profiling/metrics, checkpointing, logging."""
