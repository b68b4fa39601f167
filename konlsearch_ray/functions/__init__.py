"""Large-scale training-data operations (beyond the reference's surface).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), similarity search (brute-force + bucketed ANN), text analysis
(language-ID, quality scoring, token counting, fingerprinting),
multimodal plumbing, temporal operators (tumbling/sliding windows,
sessionization, as-of / band joins), deterministic hash-based
splitting/sampling (incl. per-group stratified rates), token-budget pack
assignment (distributed ordered prefix sum), Gopher-style repetition
profiling, flat-JSON field extraction, corpus n-gram stats + benchmark
decontamination, per-key exact quantiles, a resumable partitioned
Parquet sink, a zero-shuffle broadcast lookup join, token-window
chunking, text redaction, shuffle-free global and per-key top-k,
exact + HyperLogLog distinct counting, fixed-width histograms, and
integer-tf·idf keyword extraction,
distributed Lloyd's k-means, and a long→wide pivot — all as Ray Data ``Dataset`` pipelines.
"""
