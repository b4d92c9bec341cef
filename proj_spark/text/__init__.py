"""Text-pipeline operators: dedup, similarity, quality, language ID."""
