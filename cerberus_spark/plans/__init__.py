"""Plans: lineage, checkpointing, and plan introspection helpers."""
