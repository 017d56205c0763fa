"""Index layer: chunk store device arrays, flat/IVF dense indexes, BM25
sparse index, hybrid fusion engine, and the multi-document registry."""
