"""Corpus plumbing: TI-Digits walker, synthetic fixture corpus, padded batching."""
