"""Fit drivers — the public entry-point layer."""
