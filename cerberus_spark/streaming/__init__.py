"""Structured Streaming wrappers for continuous validation."""
