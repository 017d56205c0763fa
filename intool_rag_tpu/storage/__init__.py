"""Persistence: per-document artifact quartet and corpus registry."""
