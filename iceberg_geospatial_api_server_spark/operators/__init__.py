"""Operator library: relational analytics, dedup, similarity search,
text analysis, multimodal plumbing."""
