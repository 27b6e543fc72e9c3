"""Pallas TPU kernels for the hot ops (SURVEY.md §7 step 5)."""
