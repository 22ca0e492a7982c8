"""Sources & sinks — the lake layer (SURVEY §2.1)."""
