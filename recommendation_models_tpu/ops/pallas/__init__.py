"""Pallas TPU kernels (SURVEY.md N2) — the framework's native-code tier."""
