"""Shared utilities: seedable randomness, profiling, logging."""
