"""Utilities: typed config, checkpointing, logging/progress, profiling."""
