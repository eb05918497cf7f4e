"""Config, checkpointing, logging, profiling utilities."""
