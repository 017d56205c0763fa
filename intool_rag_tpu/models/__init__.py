"""JAX models: text-embedding encoder (BGE-M3 class), cross-encoder
reranker, and tokenizers."""
