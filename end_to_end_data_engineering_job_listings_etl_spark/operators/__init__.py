"""Composite dataflow operators (DataFrame-in / DataFrame-out)."""
