"""Placeholder — populated in a later commit."""
