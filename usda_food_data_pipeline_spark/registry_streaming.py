"""Windowed/streaming-extension queries (filled in task 7)."""
