"""Profiling, debugging and observability utilities."""
