"""Vector / FTS / hybrid retrieval inventory (filled by operators)."""

QUERIES: list = []
