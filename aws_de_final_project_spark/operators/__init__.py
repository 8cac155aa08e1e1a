"""Custom operators: dedup family, similarity search, multimodal."""
