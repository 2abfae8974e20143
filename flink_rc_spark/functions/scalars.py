"""Filled in a later milestone."""
