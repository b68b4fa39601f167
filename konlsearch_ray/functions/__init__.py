"""Large-scale training-data operations (beyond the reference's surface).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (brute-force + bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting),
multimodal plumbing, temporal operators (tumbling/sliding windows,
sessionization, as-of / band joins), deterministic hash-based
splitting/sampling, corpus n-gram stats + benchmark decontamination, and per-key
exact quantiles — all as Ray Data ``Dataset`` pipelines.
"""
