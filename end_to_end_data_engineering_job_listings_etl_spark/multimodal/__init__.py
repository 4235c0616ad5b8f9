"""Multimodal (binary) column plumbing: decode / feature-extract over
Arrow-batched mapInPandas."""
