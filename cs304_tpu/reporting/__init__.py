"""Evaluation reporting: confusion matrices, line plots, pipe-delimited CSV."""
