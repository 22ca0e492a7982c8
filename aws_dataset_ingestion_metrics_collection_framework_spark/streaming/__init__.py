"""Structured Streaming variants of the ingest pipeline (S5) and stateful
alarm evaluation (W4)."""
