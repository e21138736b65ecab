"""Structured Streaming skin over the tier aggregates."""
