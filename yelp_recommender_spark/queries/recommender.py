"""Recommender-model queries (content-based / CF / ALS surfaces mapped onto
the synthetic star schema). Filled in as models land."""
