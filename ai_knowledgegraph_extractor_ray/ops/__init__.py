"""Corpus-scale data-processing operators beyond the reference's own surface:
deduplication, text analysis, similarity search, multimodal plumbing.

These are the operations a 100 TB training-data pipeline needs around the KG
engine; each is a Dataset -> Dataset transform with the same design rules as
the core stages (Arrow batches, vectorized kernels, partial aggregation ahead
of shuffles, broadcast small sides)."""
