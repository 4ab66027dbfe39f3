"""Operators: rule compilation, normalization, dataset-level checks."""
