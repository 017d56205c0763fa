"""Environment-driven configuration.

Capability parity with the reference's env surface (reference:
rag/config.py:4-96) plus TPU-specific knobs (mesh shape, dtypes, kernel
selection). Unlike the reference, the declared values are authoritative:
providers must honor ``EMBEDDING_MODEL``/``VECTOR_DIMENSION`` instead of
hardcoding their own (the reference declares BGE-M3/1024 but its HF
provider silently uses bge-small-en-v1.5/384 — SURVEY.md §5.6).

No import-time directory side effects: directories are created lazily by
the storage layer, so importing config never touches the filesystem.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path


def _env_str(name: str, default: str) -> str:
    return os.getenv(name, default)


def _env_int(name: str, default: int) -> int:
    return int(os.getenv(name, str(default)))


def _env_float(name: str, default: float) -> float:
    return float(os.getenv(name, str(default)))


def _ocr_weights_exist() -> bool:
    from pathlib import Path

    return (Path(__file__).parent / "ocr" / "weights" / "default.npz").exists()


def _env_bool(name: str, default: bool) -> bool:
    return os.getenv(name, "true" if default else "false").strip().lower() in (
        "1",
        "true",
        "yes",
        "on",
    )


@dataclasses.dataclass
class Config:
    """Runtime configuration; every field has an env-var override.

    Field names intentionally match the reference's Config attributes
    (reference: rag/config.py) so operators can move over .env files
    unchanged. New TPU-specific fields are grouped at the bottom.
    """

    # --- API keys / external providers ---
    # NOTE: no hardcoded default key (the reference ships one — config.py:6,
    # catalogued in SURVEY.md §7.4 as a bug not to replicate).
    GEMINI_API_KEY: str = dataclasses.field(
        default_factory=lambda: _env_str("GEMINI_API_KEY", "")
    )

    # --- Embedding ---
    EMBEDDING_MODEL: str = dataclasses.field(
        default_factory=lambda: _env_str("EMBEDDING_MODEL", "BAAI/bge-m3")
    )
    EMBEDDING_DEVICE: str = dataclasses.field(
        default_factory=lambda: _env_str("EMBEDDING_DEVICE", "tpu")
    )
    EMBEDDING_BATCH_SIZE: int = dataclasses.field(
        default_factory=lambda: _env_int("EMBEDDING_BATCH_SIZE", 64)
    )
    EMBEDDING_MAX_PARALLEL: int = dataclasses.field(
        default_factory=lambda: _env_int("EMBEDDING_MAX_PARALLEL", 3)
    )
    EMBEDDING_PROVIDER: str = dataclasses.field(
        default_factory=lambda: _env_str("EMBEDDING_PROVIDER", "")
    )
    # encoder architecture preset when no checkpoint dictates dims:
    # auto (bge-m3 on TPU, tiny on CPU) | bge_m3 | small | tiny
    EMBEDDING_PRESET: str = dataclasses.field(
        default_factory=lambda: _env_str("EMBEDDING_PRESET", "auto")
    )
    # path to a native self-trained encoder checkpoint
    # (models/encoder.py save_encoder_checkpoint); takes precedence over
    # HF weight resolution when set
    EMBEDDING_CHECKPOINT: str = dataclasses.field(
        default_factory=lambda: _env_str("EMBEDDING_CHECKPOINT", "")
    )
    EMBEDDING_QUERY_INSTRUCTION: str = dataclasses.field(
        default_factory=lambda: _env_str(
            "EMBEDDING_QUERY_INSTRUCTION",
            "Represent this sentence for searching relevant passages: ",
        )
    )
    EMBEDDING_PASSAGE_INSTRUCTION: str = dataclasses.field(
        default_factory=lambda: _env_str("EMBEDDING_PASSAGE_INSTRUCTION", "")
    )

    # --- LLM ---
    LLM_MODEL: str = dataclasses.field(
        default_factory=lambda: _env_str("LLM_MODEL", "qwen2.5:7b-instruct-q4_K_M")
    )
    LLM_TEMPERATURE: float = dataclasses.field(
        default_factory=lambda: _env_float("LLM_TEMPERATURE", 0.3)
    )
    LLM_MAX_TOKENS: int = dataclasses.field(
        default_factory=lambda: _env_int("LLM_MAX_TOKENS", 512)
    )
    LLM_RELEVANCE_THRESHOLD: float = dataclasses.field(
        default_factory=lambda: _env_float("LLM_RELEVANCE_THRESHOLD", 0.4)
    )
    LLM_BASE_URL: str = dataclasses.field(
        default_factory=lambda: _env_str("LLM_BASE_URL", "http://localhost:11434")
    )
    LLM_TIMEOUT: float = dataclasses.field(
        default_factory=lambda: _env_float("LLM_TIMEOUT", 150.0)
    )
    LLM_PROVIDER: str = dataclasses.field(
        default_factory=lambda: _env_str("LLM_PROVIDER", "")
    )
    # Local HF Llama checkpoint dir for LLM_PROVIDER=tpu (in-process
    # TPU generation — providers/tpu_llm.py). Empty = tiny random model.
    LLM_MODEL_PATH: str = dataclasses.field(
        default_factory=lambda: _env_str("LLM_MODEL_PATH", "")
    )
    # sampling controls for the in-process decoder (0 / 1.0 = disabled)
    LLM_TOP_K: int = dataclasses.field(
        default_factory=lambda: _env_int("LLM_TOP_K", 0)
    )
    LLM_TOP_P: float = dataclasses.field(
        default_factory=lambda: _env_float("LLM_TOP_P", 1.0)
    )
    # continuous batching for the in-process decoder: >0 = serve
    # concurrent generate() calls through a shared slot scheduler with
    # that many slots (models/scheduler.py); 0 = one static-batch
    # compiled program per call
    LLM_CONTINUOUS_SLOTS: int = dataclasses.field(
        default_factory=lambda: _env_int("LLM_CONTINUOUS_SLOTS", 0)
    )
    # prompt-lookup speculative decoding (greedy only): >0 = gamma
    # tokens verified per forward. Single-stream generation drafts from
    # the prompt (models/decoder.py make_lookup_speculative_fn); with
    # LLM_CONTINUOUS_SLOTS it composes into BATCHED speculative waves —
    # every slot drafts from its own rolling history window and one
    # forward verifies all slots (models/scheduler.py). 0 = off
    LLM_SPECULATIVE_GAMMA: int = dataclasses.field(
        default_factory=lambda: _env_int("LLM_SPECULATIVE_GAMMA", 0)
    )

    # --- Reranker (implemented for real here; declared-only in the
    # reference — rag/config.py:24-27, SURVEY.md §0) ---
    RERANKER_MODEL: str = dataclasses.field(
        default_factory=lambda: _env_str("RERANKER_MODEL", "BAAI/bge-reranker-v2-m3")
    )
    RERANKER_ENABLED: bool = dataclasses.field(
        default_factory=lambda: _env_bool("RERANKER_ENABLED", False)
    )
    RERANKER_TOP_K: int = dataclasses.field(
        default_factory=lambda: _env_int("RERANKER_TOP_K", 10)
    )
    RERANKER_CANDIDATES: int = dataclasses.field(
        default_factory=lambda: _env_int("RERANKER_CANDIDATES", 100)
    )

    # --- Vector dimension ---
    VECTOR_DIMENSION: int = dataclasses.field(
        default_factory=lambda: _env_int("VECTOR_DIMENSION", 1024)
    )

    # --- Chunking (operating points match rag/config.py:33-38 and the
    # chunker constants in rag/ingest/node_aware_chunker.py:49-56) ---
    CHUNK_SIZE: int = dataclasses.field(
        default_factory=lambda: _env_int("CHUNK_SIZE", 512)
    )
    CHUNK_OVERLAP: int = dataclasses.field(
        default_factory=lambda: _env_int("CHUNK_OVERLAP", 50)
    )
    CHUNK_MIN_SIZE: int = dataclasses.field(
        default_factory=lambda: _env_int("CHUNK_MIN_SIZE", 50)
    )
    MAX_CHUNK_CHAR: int = dataclasses.field(
        default_factory=lambda: _env_int("MAX_CHUNK_CHAR", 2000)
    )
    CHUNK_MAX_CHARS: int = dataclasses.field(
        default_factory=lambda: _env_int("CHUNK_MAX_CHARS", 1000)
    )
    CHUNK_MIN_CHARS: int = dataclasses.field(
        default_factory=lambda: _env_int("CHUNK_MIN_CHARS", 100)
    )
    CHUNK_TARGET_CHARS: int = dataclasses.field(
        default_factory=lambda: _env_int("CHUNK_TARGET_CHARS", 600)
    )
    CHUNK_OVERLAP_CHARS: int = dataclasses.field(
        default_factory=lambda: _env_int("CHUNK_OVERLAP_CHARS", 0)
    )

    # --- Retrieval (rag/config.py:40-45) ---
    RETRIEVAL_TOP_K: int = dataclasses.field(
        default_factory=lambda: _env_int("RETRIEVAL_TOP_K", 10)
    )
    RETRIEVAL_CANDIDATES: int = dataclasses.field(
        default_factory=lambda: _env_int("RETRIEVAL_CANDIDATES", 50)
    )
    RETRIEVAL_MIN_SCORE: float = dataclasses.field(
        default_factory=lambda: _env_float("RETRIEVAL_MIN_SCORE", 0.3)
    )
    HYBRID_SEARCH_ENABLED: bool = dataclasses.field(
        default_factory=lambda: _env_bool("HYBRID_SEARCH_ENABLED", True)
    )
    BM25_WEIGHT: float = dataclasses.field(
        default_factory=lambda: _env_float("BM25_WEIGHT", 0.3)
    )
    VECTOR_WEIGHT: float = dataclasses.field(
        default_factory=lambda: _env_float("VECTOR_WEIGHT", 0.7)
    )
    FUSION_MODE: str = dataclasses.field(
        default_factory=lambda: _env_str("FUSION_MODE", "weighted")  # or "rrf"
    )
    RRF_K: int = dataclasses.field(default_factory=lambda: _env_int("RRF_K", 60))
    TOP_PAGES: int = dataclasses.field(default_factory=lambda: _env_int("TOP_PAGES", 5))

    # --- Page ranking (rag/query/page_retriever.py:186-196) ---
    PAGE_CHUNK_BOOST: float = dataclasses.field(
        default_factory=lambda: _env_float("PAGE_CHUNK_BOOST", 0.05)
    )
    PAGE_CHUNK_BOOST_CAP: float = dataclasses.field(
        default_factory=lambda: _env_float("PAGE_CHUNK_BOOST_CAP", 0.15)
    )

    # --- Structured-data boosts (rag/config.py:73-77) ---
    TABLE_BOOST_MULTIPLIER: float = dataclasses.field(
        default_factory=lambda: _env_float("TABLE_BOOST_MULTIPLIER", 1.5)
    )
    STRUCTURED_DATA_BOOST_MULTIPLIER: float = dataclasses.field(
        default_factory=lambda: _env_float("STRUCTURED_DATA_BOOST_MULTIPLIER", 1.3)
    )
    PRESERVE_TABLE_CONTENT: bool = dataclasses.field(
        default_factory=lambda: _env_bool("PRESERVE_TABLE_CONTENT", True)
    )
    TABLE_CONTEXT_PRIORITY: bool = dataclasses.field(
        default_factory=lambda: _env_bool("TABLE_CONTEXT_PRIORITY", True)
    )

    # --- Context assembly (rag/config.py:70-72; page_response.py:20-27) ---
    CONTEXT_MAX_RESULTS: int = dataclasses.field(
        default_factory=lambda: _env_int("CONTEXT_MAX_RESULTS", 3)
    )
    CONTEXT_MAX_TEXT_LENGTH: int = dataclasses.field(
        default_factory=lambda: _env_int("CONTEXT_MAX_TEXT_LENGTH", 800)
    )
    MAX_CONTEXT_LENGTH: int = dataclasses.field(
        default_factory=lambda: _env_int("MAX_CONTEXT_LENGTH", 8000)
    )
    CHAT_HISTORY_MAX_MESSAGES: int = dataclasses.field(
        default_factory=lambda: _env_int("CHAT_HISTORY_MAX_MESSAGES", 3)
    )

    # --- Cache (wired for real; the reference's caches are dead code —
    # SURVEY.md §5.9) ---
    CACHE_EMBEDDINGS: bool = dataclasses.field(
        default_factory=lambda: _env_bool("CACHE_EMBEDDINGS", True)
    )
    CACHE_QUERY_RESULTS: bool = dataclasses.field(
        default_factory=lambda: _env_bool("CACHE_QUERY_RESULTS", True)
    )
    CACHE_DIR: Path = dataclasses.field(
        default_factory=lambda: Path(_env_str("CACHE_DIR", "./storages/cache"))
    )

    # --- Storage ---
    STORAGE_DIR: Path = dataclasses.field(
        default_factory=lambda: Path(_env_str("STORAGE_DIR", "./storages"))
    )

    # --- Logging ---
    LOG_LEVEL: str = dataclasses.field(
        default_factory=lambda: _env_str("LOG_LEVEL", "INFO")
    )

    # --- HTTP client & retry (rag/config.py:79-88) ---
    HTTP_MAX_RETRIES: int = dataclasses.field(
        default_factory=lambda: _env_int("HTTP_MAX_RETRIES", 3)
    )
    HTTP_RETRY_DELAY: float = dataclasses.field(
        default_factory=lambda: _env_float("HTTP_RETRY_DELAY", 2.0)
    )
    HTTP_CONNECT_TIMEOUT: float = dataclasses.field(
        default_factory=lambda: _env_float("HTTP_CONNECT_TIMEOUT", 10.0)
    )
    HTTP_READ_TIMEOUT: float = dataclasses.field(
        default_factory=lambda: _env_float("HTTP_READ_TIMEOUT", 120.0)
    )
    HTTP_WRITE_TIMEOUT: float = dataclasses.field(
        default_factory=lambda: _env_float("HTTP_WRITE_TIMEOUT", 10.0)
    )
    HTTP_POOL_TIMEOUT: float = dataclasses.field(
        default_factory=lambda: _env_float("HTTP_POOL_TIMEOUT", 10.0)
    )
    HTTP_MAX_CONNECTIONS: int = dataclasses.field(
        default_factory=lambda: _env_int("HTTP_MAX_CONNECTIONS", 100)
    )
    HTTP_MAX_KEEPALIVE_CONNECTIONS: int = dataclasses.field(
        default_factory=lambda: _env_int("HTTP_MAX_KEEPALIVE_CONNECTIONS", 20)
    )
    INGEST_TIMEOUT: float = dataclasses.field(
        default_factory=lambda: _env_float("INGEST_TIMEOUT", 600.0)
    )

    # ================= TPU-specific (new; no reference equivalent) ========
    # Index / kernels
    INDEX_DTYPE: str = dataclasses.field(
        default_factory=lambda: _env_str("INDEX_DTYPE", "bfloat16")  # or float32
    )
    # int8 dense scoring: DenseFlatIndex keeps an int8+scales mirror of
    # the (float) store and scores with the int8 Pallas kernel — the MXU
    # runs int8 at 2× the bf16 MAC rate and the corpus HBM read halves
    # (ops/flat_pallas.flat_topk_pallas_int8). Costs +0.5× the bf16
    # store in HBM for the mirror; recall impact is bounded by int8
    # absmax rounding (~2⁻⁸ relative) and measured in bench.py.
    DENSE_INT8: bool = dataclasses.field(
        default_factory=lambda: _env_bool("DENSE_INT8", False)
    )
    # adds the corpus residual plane (quantize_int8_residual): a third
    # int8 matmul lifts corpus precision to ~15 bits (beats bf16) at
    # bf16's total mirror bytes — the recall-loss-free int8 config.
    DENSE_INT8_RESIDUAL: bool = dataclasses.field(
        default_factory=lambda: _env_bool("DENSE_INT8_RESIDUAL", False)
    )
    INDEX_KIND: str = dataclasses.field(
        default_factory=lambda: _env_str("INDEX_KIND", "flat")  # flat | ivf | ivf_residual | segmented | bits
    )
    SEARCH_BLOCK_N: int = dataclasses.field(
        default_factory=lambda: _env_int("SEARCH_BLOCK_N", 16384)
    )
    # multi-device corpus sharding: "auto" shards the dense index over all
    # devices when more than one is visible and the corpus exceeds
    # SHARDED_SEARCH_MIN_ROWS; "off" stays single-device; "on" forces it
    SHARDED_SEARCH: str = dataclasses.field(
        default_factory=lambda: _env_str("SHARDED_SEARCH", "auto")
    )
    SHARDED_SEARCH_MIN_ROWS: int = dataclasses.field(
        default_factory=lambda: _env_int("SHARDED_SEARCH_MIN_ROWS", 100_000)
    )
    # The fused Pallas kernel (vectorized grouped reduce + approx tail)
    # is the fastest TPU dense path: 7.2 ms vs 9.0 ms device time per
    # 256-query batch at 1M×1024 for XLA approx_max_k, at recall@10
    # 0.998 vs ~0.94 (and exact f32 scores, so no rescore pass). Round 1
    # had this off because the then-unvectorized kernel lost; see
    # ops/flat_pallas.py.
    USE_PALLAS: bool = dataclasses.field(
        default_factory=lambda: _env_bool("USE_PALLAS", True)
    )
    IVF_NLIST: int = dataclasses.field(
        default_factory=lambda: _env_int("IVF_NLIST", 1024)
    )
    IVF_NPROBE: int = dataclasses.field(
        default_factory=lambda: _env_int("IVF_NPROBE", 64)
    )
    # ivf_residual only: candidate-pool size for the host-DRAM int8
    # refinement pass (0 = off). The int4 device pass retrieves this
    # many rows; the host exactly rescores them from its int8 tier
    # (index/ivf_residual.py — capacity in HBM, precision from host).
    IVF_REFINE_K: int = dataclasses.field(
        default_factory=lambda: _env_int("IVF_REFINE_K", 0)
    )
    # ivf_residual code width: 4 (int4, 0.5 byte/dim — the 10-20M/chip
    # capacity point) or 1 (binary sign codes, 0.125 byte/dim — the
    # 50M+/chip point; pair with IVF_REFINE_K to recover ranking).
    IVF_RESIDUAL_BITS: int = dataclasses.field(
        default_factory=lambda: _env_int("IVF_RESIDUAL_BITS", 4)
    )
    # BM25
    BM25_K1: float = dataclasses.field(
        default_factory=lambda: _env_float("BM25_K1", 1.5)
    )
    BM25_B: float = dataclasses.field(default_factory=lambda: _env_float("BM25_B", 0.75))
    BM25_MAX_TERMS_PER_CHUNK: int = dataclasses.field(
        default_factory=lambda: _env_int("BM25_MAX_TERMS_PER_CHUNK", 128)
    )
    BM25_MAX_QUERY_TERMS: int = dataclasses.field(
        default_factory=lambda: _env_int("BM25_MAX_QUERY_TERMS", 32)
    )
    # Mesh
    MESH_DATA_AXIS: int = dataclasses.field(
        default_factory=lambda: _env_int("MESH_DATA_AXIS", 0)  # 0 = all devices
    )
    MESH_MODEL_AXIS: int = dataclasses.field(
        default_factory=lambda: _env_int("MESH_MODEL_AXIS", 1)
    )
    # OCR fallback for scanned PDF pages. Defaults to on exactly when the
    # shipped trained weights artifact exists (ocr/weights/default.npz,
    # built by `python -m intool_rag_tpu.ocr.train`); without weights the
    # recognizer would emit noise, so the default stays off.
    OCR_ENABLED: bool = dataclasses.field(
        default_factory=lambda: _env_bool("OCR_ENABLED", _ocr_weights_exist())
    )
    # Serving
    SERVICE_HOST: str = dataclasses.field(
        default_factory=lambda: _env_str("SERVICE_HOST", "0.0.0.0")
    )
    SERVICE_PORT: int = dataclasses.field(
        default_factory=lambda: _env_int("SERVICE_PORT", 8001)
    )
    QUERY_MICRO_BATCH_WINDOW_MS: float = dataclasses.field(
        default_factory=lambda: _env_float("QUERY_MICRO_BATCH_WINDOW_MS", 2.0)
    )
    QUERY_MAX_BATCH: int = dataclasses.field(
        default_factory=lambda: _env_int("QUERY_MAX_BATCH", 64)
    )

    @property
    def UPLOAD_DIR(self) -> Path:
        return self.STORAGE_DIR / "uploads"

    def ensure_dirs(self) -> None:
        """Create storage directories (explicit, not at import)."""
        for d in (self.STORAGE_DIR, self.UPLOAD_DIR, self.CACHE_DIR):
            d.mkdir(parents=True, exist_ok=True)


_config: Config | None = None


def get_config() -> Config:
    """Process-wide config singleton (re-reads env on first call only)."""
    global _config
    if _config is None:
        _config = Config()
    return _config


def reset_config() -> Config:
    """Rebuild the singleton from the current environment (for tests)."""
    global _config
    _config = Config()
    return _config
