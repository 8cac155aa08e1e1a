"""Custom operators: dedup family (exact/Jaccard/MinHash-LSH/SimHash/
winnowing), similarity search (brute/LSH/IVF), temporal joins (as-of,
range), skew salting, and multimodal column plumbing."""
