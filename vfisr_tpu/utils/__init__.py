"""Utilities: config (real YAML loading), checkpointing, logging."""
