"""LLM-data-pipeline operators (SURVEY.md §2.3 X1-X6).

Dedup (exact / normalized / MinHash-LSH / SimHash / n-gram Jaccard),
vector similarity search (brute-force + LSH-bucketed ANN), text analysis
(tokenization, quality scoring, language-ID, fingerprinting) and
multimodal binary columns — all designed for 100 TB: no driver-side
collects, candidate generation via inverted-index / banding joins rather
than quadratic cross-joins, deterministic hash families (reproducible
across runs and engines).
"""

from . import dedup, multimodal, similarity, textan  # noqa: F401
