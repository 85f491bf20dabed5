"""Text-analysis operators (extension surface). Filled in incrementally."""
