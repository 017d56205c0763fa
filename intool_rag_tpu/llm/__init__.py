"""Capability ports (abstract interfaces) + env-driven factories.

Mirrors the reference's port layer (rag/llm/ — SURVEY.md §2.5): BaseLLM,
EmbeddingProvider, SemanticAnalyzer, each with a factory that selects a
concrete provider from config with graceful fallback chains.
"""
