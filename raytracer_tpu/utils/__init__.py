"""Host-side utilities: config, image IO, timing/metrics, checkpointing."""
