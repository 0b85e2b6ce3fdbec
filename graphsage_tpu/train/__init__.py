"""Training loops, CLI flag surface, metrics, checkpointing."""
