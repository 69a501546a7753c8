"""Library operators the engine provides beyond built-in Spark SQL:

- :mod:`asof`       — as-of (backward/forward nearest) joins
- :mod:`dedup`      — exact + MinHash-LSH + SimHash + n-gram-Jaccard +
  embedding-cosine near-duplicate detection
- :mod:`similarity` — cosine top-k / ANN over embedding columns
- :mod:`text`       — tokenization, n-grams, tf-idf, language id,
  quality scoring, fingerprinting
- :mod:`sessions`   — sessionization (gaps-and-islands)
- :mod:`multimodal` — binary-column (image/audio/video) plumbing
- :mod:`editdist`   — PassJoin-blocked exact edit-distance similarity join
- :mod:`closure`    — pointer-doubling forest transitive closure
  (the recursive-CTE workload)
- :mod:`validate`   — declarative data-quality constraint checking
  (fused single-scan row checks, uniqueness, referential integrity)
- :mod:`merge`      — upserts, SCD2 history, snapshot-diff CDC
- :mod:`clusters`   — connected components (min-label + star contraction)
- :mod:`graph`      — PageRank, degree-ordered triangle counting
- :mod:`sketches`   — Count-Min, Bloom, HLL sketch tables
- :mod:`layout`     — Z-order clustering, small-file compaction
- :mod:`packing`    — distributed global cumsum, token-budget bins
- :mod:`quality`    — decontamination, repetition/quality filters, sampling
- :mod:`skew`       — deterministic salted joins
- :mod:`iterutils`  — lineage control for iterative chains

All are pure DataFrame compositions unless noted; Pandas UDFs appear
only where built-in operators cannot express the semantics.
"""
