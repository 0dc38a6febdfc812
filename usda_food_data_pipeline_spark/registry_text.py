"""Text-analysis and dedup-suite queries (filled in tasks 5-6)."""
