"""North-star LLM-pipeline queries (filled in below)."""
