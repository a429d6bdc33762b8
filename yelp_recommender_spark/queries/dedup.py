"""Deduplication queries over the documents table. Filled in as operators
land."""
