"""Benchmark harnesses: triplet benchmark + experiment runner."""
