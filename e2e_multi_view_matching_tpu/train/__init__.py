"""Training layer: losses, optimizer/schedule setup, train step, checkpointing."""
