"""Structured Streaming variants of the §2.J incremental operators."""
