"""Column-expression libraries (pure Catalyst expressions, no UDFs)."""
