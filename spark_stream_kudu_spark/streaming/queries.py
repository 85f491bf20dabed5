"""Streaming-surface registered queries. Filled in incrementally."""
