"""Training infrastructure: optimizer, schedules, train-step builder,
checkpointing — the TPU-native equivalent of the reference's ``optim/`` +
driver loops + apex AMP machinery (bf16 makes loss scaling unnecessary)."""
