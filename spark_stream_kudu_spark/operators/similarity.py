"""Similarity-search operators (extension surface). Filled in incrementally."""
