"""Ingestion pipeline: load → normalize → semantic tree → chunk → embed → index."""
