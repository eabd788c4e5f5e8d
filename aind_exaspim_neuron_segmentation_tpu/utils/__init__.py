"""Utility helpers: IO facades, profiling, retry, caching, misc."""
