"""Reusable column expressions and schema utilities."""
