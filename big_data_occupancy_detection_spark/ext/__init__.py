"""Scale-oriented extension operators beyond the reference's surface:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, text analysis, multimodal binary columns."""
