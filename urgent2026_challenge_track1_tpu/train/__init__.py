"""Training harness: losses, optimizer, train step, EMA, checkpointing."""
