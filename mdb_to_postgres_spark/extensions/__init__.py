"""Extension tier X (SURVEY.md §2.9): LLM-data-pipeline operators.

Deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH/IVF ANN), text analysis
(tokenize/TF-IDF/lang-id/quality/fingerprint), multimodal binary columns,
and the vectorized Python UDF surface.

Design rule: every operator has a deterministic, oracle-checkable variant;
randomized/scale variants (LSH, ANN) are registered rows-only and their
candidate-generation recall is asserted against the exact variant in tests.
"""
