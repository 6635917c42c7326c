"""Utilities: profiling, logging, validation."""
