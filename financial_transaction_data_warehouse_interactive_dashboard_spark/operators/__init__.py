"""Beyond-reference operators: dedup, similarity search, multimodal."""
