"""Operator library.

- ``annotate`` / ``nest`` — the reference's enrichment joins and
  two-level collect_set nesting (genomic lake build).
- ``dedup`` — exact, n-gram Jaccard, MinHash-LSH, SimHash.
- ``text`` — quality stats, token counts, language id, fingerprints.
- ``similarity`` — cosine top-k (exact, LSH-bucketed, pandas-UDF).
- ``events`` — tumbling/sliding/session windows, as-of join, pivot.
- ``multimodal`` — binary payload columns + mapInPandas extraction.
"""
