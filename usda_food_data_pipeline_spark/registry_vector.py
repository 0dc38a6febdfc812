"""Vector / similarity-search queries (filled in task 4)."""
