"""Multimodal binary-column operators (extension surface). Filled in incrementally."""
