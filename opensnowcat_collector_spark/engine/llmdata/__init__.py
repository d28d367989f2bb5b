"""Large-scale training-data pipeline operators over the documents /
embeddings tables: text analysis, deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard), similarity search (brute-force + LSH-bucketed
ANN), and multimodal column plumbing.

Every operator is expressed so the SAME deterministic result is computable
by the DuckDB oracle: hashing uses md5 (identical in both engines), set
arithmetic uses distinct-array operations, and float reductions are either
exact integer fixed-point or element-wise products folded in a fixed order.
"""
