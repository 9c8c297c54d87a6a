"""Host-side utilities: logging, visualization, checkpointing, timing."""
