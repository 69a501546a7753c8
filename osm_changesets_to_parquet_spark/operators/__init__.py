"""Library operators the engine provides beyond built-in Spark SQL:

- :mod:`asof`       — as-of (backward/forward nearest) joins
- :mod:`dedup`      — exact + MinHash-LSH + SimHash + n-gram-Jaccard +
  embedding-cosine near-duplicate detection
- :mod:`similarity` — cosine top-k / ANN over embedding columns
- :mod:`text`       — tokenization, n-grams, tf-idf, language id,
  quality scoring, fingerprinting
- :mod:`sessions`   — sessionization (gaps-and-islands)
- :mod:`multimodal` — binary-column (image/audio/video) plumbing

All are pure DataFrame compositions unless noted; Pandas UDFs appear
only where built-in operators cannot express the semantics.
"""
