"""ChunkStore / DenseFlatIndex / HybridEngine / CorpusRegistry tests."""

import jax.numpy as jnp
import numpy as np

from intool_rag_tpu.index.bm25_index import BM25Index
from intool_rag_tpu.index.chunk_store import ChunkStore
from intool_rag_tpu.index.flat_index import DenseFlatIndex
from intool_rag_tpu.index.hybrid import HybridEngine
from intool_rag_tpu.index.registry import CorpusRegistry
from intool_rag_tpu.ingest.schemas import (
    Chunk,
    ChunksIndex,
    PageIndex,
    VectorMeta,
)


def _embed(texts, dim=64, seed=0):
    """Deterministic pseudo-embeddings: same text -> same vector."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, t in enumerate(texts):
        r = np.random.default_rng(abs(hash((seed, t))) % (2**32))
        out[i] = r.standard_normal(dim)
    out /= np.linalg.norm(out, axis=1, keepdims=True)
    return out


def test_chunk_store_append_and_pad():
    store = ChunkStore(dim=64, dtype="float32")
    emb = _embed(["a", "b", "c"])
    store.append(emb, "d1", ["c_000_000", "c_000_001", "c_001_000"], [0, 0, 1],
                 ["a", "b", "c"])
    assert len(store) == 3
    assert store.n_pad % 1024 == 0
    assert store.embeddings.shape[1] == 128  # dim padded to lane width
    ref = store.ref(2)
    assert (ref.doc_id, ref.chunk_id, ref.page) == ("d1", "c_001_000", 1)
    # second doc appends after first
    store.append(_embed(["d"]), "d2", ["c_000_000"], [0], ["d"])
    assert len(store) == 4
    assert store.ref(3).doc_id == "d2"


def test_chunk_store_without_doc():
    store = ChunkStore(dim=16, dtype="float32")
    store.append(_embed(["a", "b"], 16), "d1", ["c_000_000", "c_000_001"], [0, 0], ["a", "b"])
    store.append(_embed(["c"], 16), "d2", ["c_000_000"], [0], ["c"])
    new, removed = store.without_doc("d1")
    assert removed == 2
    assert len(new) == 1
    assert new.ref(0).doc_id == "d2"
    # copy-on-write: the original store is untouched for live readers
    assert len(store) == 3
    assert store.ref(0).doc_id == "d1"
    assert store.without_doc("nope") == (store, 0)


def test_chunk_store_save_load(tmp_path):
    store = ChunkStore(dim=32, dtype="float32")
    emb = _embed(["x", "y"], 32)
    store.append(emb, "d1", ["c_000_000", "c_000_001"], [0, 1], ["x", "y"])
    store.save(tmp_path / "corpus")
    store2 = ChunkStore.load(tmp_path / "corpus")
    assert len(store2) == 2
    np.testing.assert_allclose(
        np.asarray(store2.embeddings[:2, :32]), emb, atol=1e-6
    )
    assert store2.ref(1).chunk_id == "c_000_001"


def test_dense_flat_index_search():
    texts = [f"doc {i}" for i in range(100)]
    emb = _embed(texts)
    store = ChunkStore(dim=64, dtype="float32")
    store.append(emb, "d1", [f"c_000_{i:03d}" for i in range(100)],
                 [0] * 100, texts)
    index = DenseFlatIndex(store)
    q = jnp.asarray(emb[:3])  # query with known rows
    vals, rows = index.search(q, k=1)
    assert np.asarray(rows)[:, 0].tolist() == [0, 1, 2]
    assert np.asarray(vals)[:, 0] == __import__("pytest").approx(1.0, abs=1e-3)


def test_dense_flat_index_l2_bf16_rescore_ordering():
    """bf16 store triggers exact-f32 rescoring; for metric='l2' the
    rescore must use the same 2·ip − |e|² score space, not a raw inner
    product (ADVICE.md round 1 — inner product re-ranked l2 results)."""
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((200, 64)).astype(np.float32)
    # wildly varying norms so ip-ordering != l2-ordering
    emb *= rng.uniform(0.1, 10.0, (200, 1)).astype(np.float32)
    texts = [f"doc {i}" for i in range(200)]
    store = ChunkStore(dim=64, dtype="bfloat16")
    store.append(emb, "d1", [f"c_000_{i:03d}" for i in range(200)],
                 [0] * 200, texts)
    index = DenseFlatIndex(store, metric="l2")
    queries = emb[:5] + rng.normal(0, 0.01, (5, 64)).astype(np.float32)
    _, rows = index.search(jnp.asarray(queries), k=10)
    got_top1 = np.asarray(rows)[:, 0]
    # NumPy l2 oracle
    d2 = ((queries[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    want_top1 = d2.argmin(1)
    assert (got_top1 == want_top1).all(), (got_top1, want_top1)


def test_hybrid_engine_weighted(tmp_storage):
    texts = [
        "the fox jumped over the fence",
        "quarterly finance report with revenue figures",
        "fox habitat and wildlife conservation",
        "cooking recipes for pasta dishes",
    ]
    emb = _embed(texts)
    store = ChunkStore(dim=64, dtype="float32")
    store.append(emb, "d1", [f"c_000_{i:03d}" for i in range(4)], [0, 1, 2, 3], texts)
    engine = HybridEngine(store, BM25Index.build(texts))
    # query embedding equals doc 1's vector, but query text says "fox":
    # hybrid must rank doc 1 first (0.7 dense) with fox docs present.
    vals, rows = engine.search(["fox"], jnp.asarray(emb[1:2]), k=4)
    r = np.asarray(rows)[0].tolist()
    assert r[0] == 1
    assert {0, 2}.issubset(set(r))  # BM25 brings in both fox docs


def test_hybrid_engine_dense_only(tmp_storage, monkeypatch):
    monkeypatch.setenv("HYBRID_SEARCH_ENABLED", "false")
    from intool_rag_tpu import config as config_mod

    config_mod.reset_config()
    texts = ["alpha", "beta", "gamma"]
    emb = _embed(texts)
    store = ChunkStore(dim=64, dtype="float32")
    store.append(emb, "d1", [f"c_000_{i:03d}" for i in range(3)], [0, 1, 2], texts)
    engine = HybridEngine(store, BM25Index.build(texts))
    vals, rows = engine.search(["beta"], jnp.asarray(emb[2:3]), k=2)
    assert np.asarray(rows)[0, 0] == 2  # pure dense ignores the text


def _persist_doc(storage, doc_id, texts, pages, project="p1"):
    chunks = ChunksIndex(
        doc_id=doc_id,
        chunks=[
            Chunk(f"c_{p:03d}_{i:03d}", "", p, t)
            for i, (t, p) in enumerate(zip(texts, pages))
        ],
    )
    storage.save_chunks(chunks)
    storage.save_page_index(
        PageIndex(doc_id=doc_id, project=project, page_count=max(pages) + 1)
    )
    emb = _embed(texts)
    meta = VectorMeta(
        doc_id=doc_id,
        model="test",
        dimension=64,
        count=len(texts),
        chunk_ids=[c.chunk_id for c in chunks.chunks],
        pages=pages,
    )
    storage.save_vectors(doc_id, emb, meta)
    return emb


def test_registry_multi_document_search(tmp_storage):
    reg = CorpusRegistry()
    e1 = _persist_doc(reg.storage, "docA", ["fox in the woods", "river and lake"], [0, 1])
    e2 = _persist_doc(reg.storage, "docB", ["invoice total amount", "payment due date"], [0, 0], project="p2")
    assert reg.load_all() == 2
    assert reg.stats()["chunks"] == 4
    # query for docB content — the reference would have missed it by
    # searching only the first index (faiss_index.py:167)
    hits = reg.search(["invoice amount"], jnp.asarray(e2[0:1]), k=2)[0]
    assert hits[0]["doc_id"] == "docB"
    assert hits[0]["chunk_id"] == "c_000_000"
    # project filter
    hits_p1 = reg.search(["invoice amount"], jnp.asarray(e2[0:1]), k=2, project="p1")[0]
    assert all(h["doc_id"] == "docA" for h in hits_p1)


def test_registry_remove_document(tmp_storage):
    reg = CorpusRegistry()
    _persist_doc(reg.storage, "docA", ["alpha text one", "beta text two"], [0, 0])
    reg.load_all()
    assert reg.remove_document("docA")
    assert reg.stats()["chunks"] == 0
    assert reg.storage.list_documents() == []


def test_registry_document_info(tmp_storage):
    reg = CorpusRegistry()
    _persist_doc(reg.storage, "docA", ["some text here"], [0])
    reg.load_all()
    docs = reg.list_documents()
    assert len(docs) == 1
    info = docs[0]
    assert info["doc_id"] == "docA"
    assert info["chunk_count"] == 1
    assert info["vectors_indexed"] == 1
    assert info["dimension"] == 64


def test_registry_add_document_carries_dense_index(tmp_storage):
    """Review finding: add_document re-wraps the engine around the new
    BM25, which used to discard the dense index's derived state (IVF
    partition / streaming segments) on EVERY ingest — the incremental
    paths never engaged. The dense index must carry over when the store
    object is unchanged."""
    reg = CorpusRegistry()
    _persist_doc(reg.storage, "docA", ["alpha text one", "beta text two"], [0, 0])
    reg.load_all()
    dense_before = reg.engine.dense
    store_before = reg.engine.store
    _persist_doc(reg.storage, "docB", ["gamma text three"], [0])
    reg.add_document("docB")
    assert reg.engine.store is store_before  # in-place append
    assert reg.engine.dense is dense_before  # derived state carried over
    assert reg.stats()["chunks"] == 3


def test_chunk_store_rejects_integer_dtype():
    import pytest

    with pytest.raises(ValueError, match="DENSE_INT8"):
        ChunkStore(dim=16, dtype="int8")


def test_dense_int8_mirror_caches_and_invalidates():
    """DENSE_INT8's quantized mirror must rebuild exactly when the store
    mutates (stale codes would serve deleted/old rows)."""
    store = ChunkStore(dim=64, dtype="bfloat16")
    texts = [f"t{i}" for i in range(8)]
    store.append(_embed(texts), "d1", [f"c{i}" for i in range(8)], [1] * 8, texts)
    index = DenseFlatIndex(store)
    q8a, s8a, res_a = index._int8_mirror()
    q8b, _, _ = index._int8_mirror()
    assert q8a is q8b  # cached between mutations
    assert q8a.dtype == jnp.int8
    assert s8a.shape[0] == store.embeddings.shape[0]
    # int8 absmax codes reconstruct the stored rows to ~1% of absmax
    deq = np.asarray(q8a, np.float32) * np.asarray(s8a)[:, None]
    want = np.asarray(store.embeddings, np.float32)
    assert np.max(np.abs(deq - want)) <= np.max(np.abs(want)) / 127.0 + 1e-6
    assert res_a is None  # residual plane only built when requested
    # residual upgrade on the same mutation: rebuilds with the q2 plane,
    # lifting reconstruction to the 15-bit grid
    q8r, s8r, res = index._int8_mirror(residual=True)
    assert res is not None and res.dtype == jnp.int8
    deq2 = (
        np.asarray(q8r, np.float32) + np.asarray(res, np.float32) / 128.0
    ) * np.asarray(s8r)[:, None]
    assert np.max(np.abs(deq2 - want)) <= np.max(np.abs(want)) / 127.0 / 128.0 + 1e-6
    more = [f"u{i}" for i in range(4)]
    store.append(_embed(more), "d2", [f"m{i}" for i in range(4)], [1] * 4, more)
    q8c, _, _ = index._int8_mirror()
    assert q8c is not q8a  # rebuilt on mutation
