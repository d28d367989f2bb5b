"""Query surface over collected events and the synthetic test tables.

``relational`` covers SURVEY.md §2.8 (scans, joins, aggregations, windows,
set ops, scalar functions, JSON); ``llmdata`` adds the large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal plumbing).
"""
