"""Event-time window queries (filled in below)."""
