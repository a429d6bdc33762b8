"""Text-analysis queries over the documents table — TF-IDF family (A2-A5)
plus LLM-pipeline text ops. Filled in as operators land."""
