"""Relational operators over SFA words + training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing)."""
