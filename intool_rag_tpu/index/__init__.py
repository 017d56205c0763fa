"""Index layer: chunk store device arrays, flat/IVF dense indexes, BM25
sparse index, hybrid fusion engine, and the multi-document registry."""

from .bm25_index import BM25Index, BM25Params  # noqa: F401
from .chunk_store import ChunkRef, ChunkStore  # noqa: F401
from .flat_index import DenseFlatIndex  # noqa: F401
from .hybrid import HybridEngine  # noqa: F401
from .ivf_index import IVFFlatIndex  # noqa: F401
from .registry import CorpusRegistry, get_registry  # noqa: F401
