"""Training-data-pipeline operators: dedup, similarity search, text analysis,
multimodal plumbing, and the GIE-style relational surface."""
