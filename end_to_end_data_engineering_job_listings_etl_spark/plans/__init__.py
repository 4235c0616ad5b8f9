"""End-to-end pipelines (star schema) and the BI query surface."""
