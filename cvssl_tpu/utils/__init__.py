"""Checkpointing, logging, profiling utilities."""
