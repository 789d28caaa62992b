"""Auxiliary subsystems: checkpointing, metrics, profiling."""
