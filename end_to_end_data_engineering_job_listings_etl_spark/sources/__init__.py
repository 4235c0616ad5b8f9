"""Readers: explicit-schema scans and schema conformance."""
