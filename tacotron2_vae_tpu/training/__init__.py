"""Training runtime: loss, train state, loop, checkpointing, logging."""
