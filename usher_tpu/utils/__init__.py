"""Utility subsystems (tracing, timers)."""
