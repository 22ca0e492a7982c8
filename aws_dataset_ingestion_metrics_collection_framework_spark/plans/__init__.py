"""Pre-planning query generation (SURVEY §4): the engine's 'optimizer'
surface is Catalyst; this package holds driver-side plan builders that
generate DataFrame plans from definitions (no custom Catalyst rules are
needed for parity)."""
