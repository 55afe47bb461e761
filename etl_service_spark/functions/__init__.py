"""Expression-level building blocks (templating, hashing, text, decimal)."""
