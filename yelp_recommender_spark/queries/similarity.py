"""Similarity-search queries over the embeddings table. Filled in as
operators land."""
