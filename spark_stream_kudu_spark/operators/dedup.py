"""Deduplication operators (extension surface; SURVEY.md §2.4 north star).

Implemented Spark-first, filled in incrementally:
exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.
"""
