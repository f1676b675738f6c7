"""Logging, metrics, profiling helpers."""
