"""TPU embedding provider: batched encoder inference on device.

Replaces the reference's sentence-transformers delegation
(rag/providers/hf/embeddings.py) with the JAX encoder
(models/encoder.py). Batches are padded to shape buckets so jit
recompilation is bounded; the forward runs bf16 on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_config
from ..logging import get_logger
from ..models.encoder import EncoderConfig, encode_fn, init_params
from ..models.tokenizer import get_tokenizer
from .base import instruction_prefix

logger = get_logger(__name__)

_SEQ_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket(n: int, buckets=_SEQ_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class TPUEmbeddingProvider:
    """EmbeddingProvider implementation over models.encoder.TextEncoder."""

    def __init__(
        self,
        config: EncoderConfig | None = None,
        params=None,
        tokenizer=None,
        model_name: str | None = None,
    ) -> None:
        cfg = get_config()
        self._model_name = model_name or cfg.EMBEDDING_MODEL
        self.encoder_config = config or self._default_config()
        if params is None:
            # may replace encoder_config with the checkpoint's dims, so it
            # runs BEFORE the tokenizer is sized
            params = self._load_local_weights()
        if params is None:
            logger.warning(
                "no weights available for %s — initializing random params "
                "(embedding quality is placeholder until weights are loaded)",
                self._model_name,
            )
            params = init_params(self.encoder_config)
        # pin params to the device ONCE: checkpoint loading returns host
        # numpy leaves, and a jitted call with numpy params re-uploads
        # the whole state every invocation — measured as 1.1 s/query
        # embed on the TPU tunnel (bench_service_profile, round 5) for
        # a 26.8 MB checkpoint, dwarfing the 28 ms fused search
        self.params = jax.device_put(params)
        jax.block_until_ready(self.params)
        self.tokenizer = tokenizer or get_tokenizer(
            self._model_name,
            vocab_size=self.encoder_config.vocab_size,
            max_length=min(self.encoder_config.max_position - 2, 8192),
        )
        self._fn = jax.jit(encode_fn(self.encoder_config))
        self.batch_size = cfg.EMBEDDING_BATCH_SIZE
        # Ragged packed encoding (models/packing.py): several texts per
        # row behind block-diagonal attention, instead of padding every
        # row to the batch's seq bucket. EMBED_PACKED=1 opts in;
        # EMBED_PACK_WIDTH tunes the row width.
        import os

        from ..models.encoder import TextEncoder

        self.packed = os.getenv("EMBED_PACKED", "0") not in ("0", "false", "")
        self.pack_width = int(os.getenv("EMBED_PACK_WIDTH", "512"))
        _model = TextEncoder(self.encoder_config)

        def _packed_fn(params, ids, seg, cls):
            return _model.apply(
                params, ids, (seg > 0).astype(jnp.int32),
                segment_ids=seg, cls_index=cls,
            )

        self._fn_packed = jax.jit(_packed_fn)

    def _load_local_weights(self):
        """Load weights: a native self-trained checkpoint
        (EMBEDDING_CHECKPOINT — models/encoder.py
        save_encoder_checkpoint) takes precedence, then HF weights when
        EMBEDDING_MODEL resolves locally (a cached hub model or a local
        directory) — the state-dict mapping is parity-tested against
        torch, so real BGE-M3 weights reproduce its embeddings. Returns
        None when nothing is available (zero-egress environments)."""
        import os

        ckpt = get_config().EMBEDDING_CHECKPOINT
        if ckpt and os.path.exists(ckpt):
            from ..models.encoder import load_encoder_checkpoint

            self.encoder_config, params = load_encoder_checkpoint(ckpt)
            logger.info("loaded native encoder checkpoint %s", ckpt)
            return params

        from ..models.encoder import load_torch_state_dict

        try:
            from transformers import AutoConfig, AutoModel

            hf_config = AutoConfig.from_pretrained(
                self._model_name, local_files_only=True
            )
            model = AutoModel.from_pretrained(
                self._model_name, local_files_only=True, add_pooling_layer=False
            )
            self.encoder_config = EncoderConfig(
                vocab_size=hf_config.vocab_size,
                hidden_size=hf_config.hidden_size,
                num_layers=hf_config.num_hidden_layers,
                num_heads=hf_config.num_attention_heads,
                intermediate_size=hf_config.intermediate_size,
                max_position=hf_config.max_position_embeddings,
                type_vocab_size=getattr(hf_config, "type_vocab_size", 1),
                pad_token_id=hf_config.pad_token_id or 1,
                dtype=self.encoder_config.dtype,
            )
            params = load_torch_state_dict(self.encoder_config, model.state_dict())
            logger.info("loaded local HF weights for %s", self._model_name)
            return params
        except Exception as exc:
            logger.info("no local weights for %s (%s)", self._model_name, exc)
            return None

    def _default_config(self) -> EncoderConfig:
        cfg = get_config()
        preset = cfg.EMBEDDING_PRESET
        if preset == "auto":
            preset = (
                "tiny"
                if cfg.EMBEDDING_DEVICE == "cpu" or jax.default_backend() == "cpu"
                else "bge_m3"
            )
        if preset == "bge_m3":
            return EncoderConfig.bge_m3()
        if preset == "small":
            return EncoderConfig(
                vocab_size=32_768, hidden_size=384, num_layers=6, num_heads=6,
                intermediate_size=1536, max_position=2050, dtype="bfloat16",
            )
        return EncoderConfig.tiny()

    # --- EmbeddingProvider API ---

    @property
    def dimension(self) -> int:
        return self.encoder_config.hidden_size

    @property
    def model_name(self) -> str:
        return self._model_name

    def embed_batch(self, texts: list[str], *, is_query: bool = False) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dimension), np.float32)
        prefix = instruction_prefix(is_query)
        if prefix:
            texts = [prefix + t for t in texts]
        if self.packed:
            return self._embed_batch_packed(texts)
        out = np.zeros((len(texts), self.dimension), np.float32)
        bs = self.batch_size
        for start in range(0, len(texts), bs):
            batch = texts[start : start + bs]
            emb = self._encode_device(batch)
            out[start : start + len(batch)] = np.asarray(emb)[: len(batch)]
        return out

    def embed_batch_device(self, texts: list[str], *, is_query: bool = False):
        """Single-micro-batch embed returning the DEVICE array (rows
        beyond ``len(texts)`` are bucket padding). The retriever's
        batched path uses this to skip the device→host→device round
        trip `embed_batch` + `jnp.asarray` costs (~50 ms on the TPU
        tunnel per query batch). Falls back to None when the batch
        exceeds one micro-batch or packing is on (callers then use
        ``embed_batch``)."""
        if not texts or len(texts) > self.batch_size or self.packed:
            return None
        prefix = instruction_prefix(is_query)
        if prefix:
            texts = [prefix + t for t in texts]
        return self._encode_device(texts)

    def _encode_device(self, batch: list[str]):
        ids, mask = self.tokenizer.encode_batch(batch)
        # pad to (batch bucket, seq bucket) to bound recompiles
        b_pad = _bucket(len(batch), (1, 2, 4, 8, 16, 32, 64, 128, 256))
        s_pad = _bucket(ids.shape[1])
        ids_p = np.full((b_pad, s_pad), self.tokenizer.pad_id, np.int32)
        mask_p = np.zeros((b_pad, s_pad), np.int32)
        ids_p[: len(batch), : ids.shape[1]] = ids
        mask_p[: len(batch), : ids.shape[1]] = mask
        return self._fn(self.params, jnp.asarray(ids_p), jnp.asarray(mask_p))

    def _embed_batch_packed(self, texts: list[str]) -> np.ndarray:
        """Packed encode: FFD bin-packing into fixed-width rows with
        block-diagonal attention and per-segment CLS pooling. Embeddings
        match the padded path (f32 bit-exact; bf16 to tolerance) — the
        per-text computation is identical, only the layout changes."""
        from ..models.packing import build_packed_arrays, pack_bins, shrink_width

        pad = self.tokenizer.pad_id
        ids_list: list[list[int]] = []
        for start in range(0, len(texts), self.batch_size):
            ids, mask = self.tokenizer.encode_batch(texts[start : start + self.batch_size])
            for r, m in zip(ids, mask):
                ids_list.append([int(t) for t, v in zip(r, m) if v])
        w = max(
            self.pack_width,
            -(-max(len(r) for r in ids_list) // 128) * 128,
        )
        bins = pack_bins([len(r) for r in ids_list], w)
        w = shrink_width(bins, w)
        # one launch carries about a padded batch's worth of tokens
        r_launch = max(1, (self.batch_size * 256) // w)
        out = np.zeros((len(ids_list), self.dimension), np.float32)
        pending = []
        for s in range(0, len(bins), r_launch):
            ids, seg, cls, idxmat = build_packed_arrays(
                ids_list, bins[s : s + r_launch], w, pad
            )
            pending.append((
                idxmat,
                self._fn_packed(
                    self.params, jnp.asarray(ids), jnp.asarray(seg),
                    jnp.asarray(cls),
                ),
            ))
        for idxmat, emb in pending:
            e = np.asarray(emb)  # [n, P, H]
            valid = idxmat >= 0
            out[idxmat[valid]] = e[valid]
        return out

    def embed_single(self, text: str, *, is_query: bool = False) -> np.ndarray:
        return self.embed_batch([text], is_query=is_query)[0]
