"""Higher-level channel models built on the tracer."""
