"""Embedded public data snapshots (zip-safe: plain Python modules)."""
