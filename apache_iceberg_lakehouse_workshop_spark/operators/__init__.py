"""Engine operators: relational helpers, dedup, similarity search, text
analysis, data-quality audits, multimodal column plumbing."""
