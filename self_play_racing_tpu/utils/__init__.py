"""Eval metrics, checkpointing, visualization, profiling utilities."""
