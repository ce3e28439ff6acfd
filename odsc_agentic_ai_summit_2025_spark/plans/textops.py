"""Text-analysis query inventory (filled by operators/textops)."""

QUERIES: list = []
