"""Structured Streaming analogs of the reference's incremental path."""
