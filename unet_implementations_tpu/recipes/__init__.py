"""Per-model recipes wiring the shared core to the reference entry points."""
