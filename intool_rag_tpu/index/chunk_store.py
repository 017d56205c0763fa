"""Device-resident chunk corpus: embedding matrix + id tables.

The TPU equivalent of the reference's FAISS index + sidecar JSON metadata
(reference: rag/storage/faiss_index.py + file_storage.py): embeddings are
one padded ``[N_pad, D]`` device array (bf16 by default) and the
vector_id ↔ (doc, chunk, page) identity is positional, exactly like the
reference's positional faiss_id mapping (faiss_index.py:178-181) — but
over ALL documents at once, so search spans the whole corpus rather than
the first index found (reference bug at faiss_index.py:167, SURVEY.md §7.4).

Rows are padded to a block multiple so the Pallas flat-search kernel
(ops/flat_pallas.py) gets aligned shapes; ``valid_n`` masks the tail.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

# Pad N so the Pallas fused kernel's grid divides evenly: its block is
# 128·group_l rows (group_l ≤ 128 → max block 16384). 4096 (= 128·32)
# admits the measured-fastest kernel config at 1M rows (group_l 32 /
# block_n 4096: 12.1 vs 14.5 ms/256-query batch for the 16/2048 config);
# DenseFlatIndex still halves group_l until 128·group_l divides n_pad,
# so stores persisted with the older 1024-row padding degrade gracefully.
# Waste is ≤4095 rows (≤8 MB at d1024 bf16) — negligible at the corpus
# sizes where the Pallas path runs.
_ROW_BLOCK = 4096
_DIM_BLOCK = 128  # pad D to lane width


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


@dataclasses.dataclass
class ChunkRef:
    """Identity of one corpus row."""

    doc_id: str
    chunk_id: str
    page: int


class ChunkStore:
    """Append-able embedding corpus with positional identity tables."""

    def __init__(self, dim: int, dtype: str = "bfloat16") -> None:
        self.dim = dim
        self.dim_pad = _round_up(dim, _DIM_BLOCK)
        self.dtype = jnp.dtype(dtype)
        if not jnp.issubdtype(self.dtype, jnp.floating):
            # a plain dtype cast would zero unit-norm embeddings; integer
            # storage needs scales — use DENSE_INT8 (an int8+scales
            # mirror in DenseFlatIndex) or the IVF residual/bits tiers
            raise ValueError(
                f"ChunkStore dtype must be floating, got {dtype}; "
                "for int8 scoring set DENSE_INT8=1"
            )
        self.valid_n = 0
        self.mutation_count = 0  # bumped on append/remove (derived-index invalidation)
        self._embeddings = jnp.zeros((_ROW_BLOCK, self.dim_pad), dtype=self.dtype)
        # host-side identity tables (positional, row -> identity)
        self.doc_ids: list[str] = []
        self.chunk_ids: list[str] = []
        self.pages: np.ndarray = np.zeros(0, np.int32)
        self.texts: list[str] = []

    # ---------------- properties ----------------

    @property
    def embeddings(self) -> jnp.ndarray:
        """Padded [N_pad, D_pad] device array."""
        return self._embeddings

    @property
    def n_pad(self) -> int:
        return self._embeddings.shape[0]

    def __len__(self) -> int:
        return self.valid_n

    def ref(self, row: int) -> ChunkRef:
        return ChunkRef(self.doc_ids[row], self.chunk_ids[row], int(self.pages[row]))

    def rows_for_doc(self, doc_id: str) -> list[int]:
        return [i for i, d in enumerate(self.doc_ids) if d == doc_id]

    # ---------------- mutation ----------------

    def append(
        self,
        embeddings: np.ndarray,  # [M, dim] float
        doc_id: str,
        chunk_ids: list[str],
        pages: list[int],
        texts: list[str],
    ) -> None:
        m, d = embeddings.shape
        if d != self.dim:
            raise ValueError(f"embedding dim {d} != store dim {self.dim}")
        if not (m == len(chunk_ids) == len(pages) == len(texts)):
            raise ValueError("length mismatch between embeddings and identities")
        # Cosine scoring downstream clamps scores into [0, 1] (reference
        # score space, faiss_index.py:87), which silently mis-ranks
        # non-normalized vectors — surface that at ingest time instead.
        norms = np.linalg.norm(np.asarray(embeddings, np.float32), axis=1)
        if norms.size and (norms.max() > 1.25 or norms.min() < 0.8):
            from ..logging import get_logger

            get_logger(__name__).warning(
                "appending non-normalized embeddings (|e| in [%.2f, %.2f]); "
                "cosine score clamping assumes unit norms — normalize in the "
                "provider or use metric='ip'/'l2'",
                float(norms.min()), float(norms.max()),
            )
        new_n = self.valid_n + m
        # Grow ON DEVICE: the old implementation fetched the whole
        # corpus to host and re-uploaded it per append — O(corpus
        # bytes) of tunnel traffic both ways for every ingested
        # document (4 GB/doc at the 1M×d1024 f32 staging size). Now
        # only the NEW rows cross host→device; existing rows move (if
        # at all) device→device when capacity crosses a _ROW_BLOCK
        # boundary (transient 2× HBM during that step).
        import jax

        add = np.zeros((m, self.dim_pad), np.float32)
        add[:, : self.dim] = embeddings
        add_dev = jnp.asarray(add, dtype=self.dtype)
        cap = self._embeddings.shape[0]
        if new_n > cap:
            new_cap = _round_up(new_n, _ROW_BLOCK)
            grown = jnp.zeros((new_cap, self.dim_pad), self._embeddings.dtype)
            self._embeddings = jax.lax.dynamic_update_slice(
                grown, self._embeddings, (0, 0)
            )
        self._embeddings = jax.lax.dynamic_update_slice(
            self._embeddings, add_dev, (self.valid_n, 0)
        )
        self.valid_n = new_n
        self.doc_ids.extend([doc_id] * m)
        self.chunk_ids.extend(chunk_ids)
        self.pages = np.concatenate([self.pages, np.asarray(pages, np.int32)])
        self.texts.extend(texts)
        self.mutation_count += 1

    def without_doc(self, doc_id: str) -> tuple["ChunkStore", int]:
        """Copy-on-write removal: returns (new store without the doc's
        rows, number of rows removed). The original store is untouched,
        so concurrent readers holding a reference keep a consistent
        row ↔ identity mapping (in-place compaction remapped rows under
        live searches — ADVICE.md round 1)."""
        keep = [i for i, d in enumerate(self.doc_ids) if d != doc_id]
        removed = self.valid_n - len(keep)
        if removed == 0:
            return self, 0
        new = ChunkStore(self.dim, str(self.dtype))
        host = np.asarray(self._embeddings[: self.valid_n], np.float32)[keep]
        padded = np.zeros(
            (_round_up(max(len(keep), 1), _ROW_BLOCK), self.dim_pad), np.float32
        )
        padded[: len(keep)] = host
        new._embeddings = jnp.asarray(padded, dtype=self.dtype)
        new.doc_ids = [self.doc_ids[i] for i in keep]
        new.chunk_ids = [self.chunk_ids[i] for i in keep]
        new.pages = self.pages[keep]
        new.texts = [self.texts[i] for i in keep]
        new.valid_n = len(keep)
        new.mutation_count = self.mutation_count + 1
        return new, removed

    # ---------------- persistence ----------------

    def save(self, path: Path | str) -> None:
        """Persist as ``<path>.npz`` (arrays) + ``<path>.meta.json``."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(
            path,
            embeddings=np.asarray(
                self._embeddings[: self.valid_n, : self.dim], np.float32
            ),
            pages=self.pages,
        )
        meta = {
            "dim": self.dim,
            "dtype": str(self.dtype),
            "valid_n": self.valid_n,
            "doc_ids": self.doc_ids,
            "chunk_ids": self.chunk_ids,
            "texts": self.texts,
        }
        Path(str(path) + ".meta.json").write_text(
            json.dumps(meta, ensure_ascii=False), encoding="utf-8"
        )

    @classmethod
    def load(cls, path: Path | str) -> "ChunkStore":
        path = Path(path)
        arrays = np.load(f"{path}.npz")
        meta = json.loads(Path(str(path) + ".meta.json").read_text(encoding="utf-8"))
        store = cls(dim=meta["dim"], dtype=meta["dtype"])
        emb = arrays["embeddings"]
        if len(emb):
            # one bulk append, grouping rows as saved
            store._append_bulk(emb, meta, arrays["pages"])
        return store

    def _append_bulk(self, emb: np.ndarray, meta: dict, pages: np.ndarray) -> None:
        n = emb.shape[0]
        padded = np.zeros((_round_up(n, _ROW_BLOCK), self.dim_pad), np.float32)
        padded[:n, : self.dim] = emb
        self._embeddings = jnp.asarray(padded, dtype=self.dtype)
        self.valid_n = n
        self.doc_ids = list(meta["doc_ids"])
        self.chunk_ids = list(meta["chunk_ids"])
        self.texts = list(meta["texts"])
        self.pages = np.asarray(pages, np.int32)
