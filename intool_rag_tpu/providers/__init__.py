"""Concrete providers behind the capability ports (reference:
rag/providers/ — SURVEY.md §2.5), plus TPU-native and deterministic fake
implementations for offline/test operation."""
