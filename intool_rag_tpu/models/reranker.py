"""Cross-encoder reranker (BGE-reranker-v2-m3 class: XLM-R body + linear
relevance head on CLS).

Implements the capability the reference declares but never built
(rag/config.py:25-27: bge-reranker-v2-m3, enabled, top-10 — no
implementation exists, SURVEY.md §0). Pair scoring runs batched bf16 on
the MXU with length bucketing (SURVEY.md §7.3 #7: pair-encoding 100
candidates/query is the FLOPs hog — bucketing keeps padding waste
bounded).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from .encoder import EncoderConfig, TextEncoder, load_torch_state_dict


class CrossEncoder(nn.Module):
    """XLM-R body + HF-style sequence-classification head: raw CLS →
    dense+tanh → out_proj(1) (matches XLMRobertaForSequenceClassification
    so real bge-reranker-v2-m3 weights port 1:1)."""

    config: EncoderConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,
        attention_mask: jax.Array,
        *,
        segment_ids: jax.Array | None = None,
        cls_index: jax.Array | None = None,
    ) -> jax.Array:
        """Score pairs. Two layouts share the same params:

        - one pair per row (default): returns ``[B]``, score from row CLS;
        - packed rows (``segment_ids`` [B, S] with ids 1..P, pads 0, and
          ``cls_index`` [B, P] = each pair's first-token offset): returns
          ``[B, P]`` — block-diagonal attention keeps pairs independent,
          so a packed pair scores identically to its unpacked self while
          the MXU sees none of the per-bucket padding waste
          (bench_rerank_profile.py: time is ~linear in padded tokens).
        """
        hidden = TextEncoder(self.config, name="body")(
            input_ids, attention_mask, pool=False, segment_ids=segment_ids
        )
        if cls_index is not None:
            cls = jnp.take_along_axis(
                hidden, cls_index[:, :, None].astype(jnp.int32), axis=1
            )  # [B, P, H]
        else:
            cls = hidden[:, 0, :]
        x = nn.Dense(self.config.hidden_size, dtype=jnp.float32, name="head_dense")(cls)
        x = jnp.tanh(x)
        score = nn.Dense(1, dtype=jnp.float32, name="head_out")(x)
        return score[..., 0]


def load_reranker_torch_state_dict(config: EncoderConfig, state_dict: dict) -> dict:
    """Map an HF ``XLMRobertaForSequenceClassification`` state dict
    (prefix ``roberta.``, head ``classifier.dense``/``classifier.out_proj``)
    onto CrossEncoder params."""
    import numpy as np

    body_sd = {
        k[len("roberta.") :]: v for k, v in state_dict.items() if k.startswith("roberta.")
    }
    body = load_torch_state_dict(config, body_sd)["params"]

    def t(name):
        v = state_dict[name]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    params = {
        "body": body,
        "head_dense": {
            "kernel": t("classifier.dense.weight").T,
            "bias": t("classifier.dense.bias"),
        },
        "head_out": {
            "kernel": t("classifier.out_proj.weight").T,
            "bias": t("classifier.out_proj.bias"),
        },
    }
    return {"params": jax.tree.map(jnp.asarray, params)}


@dataclasses.dataclass
class Reranker:
    """Pair scorer: (query, passage) → relevance, higher is better."""

    config: EncoderConfig
    params: dict
    tokenizer: object

    def __post_init__(self) -> None:
        import os

        model = CrossEncoder(self.config)
        self._apply = jax.jit(model.apply)
        # Packed (ragged) scoring: several pairs per row behind a
        # block-diagonal attention mask. Removes the per-bucket padding
        # waste (~22% measured) for ~5% extra attention FLOPs at
        # W=512/h=1024. RERANK_PACKED=1 enables; RERANK_PACK_WIDTH tunes
        # the row width (snapped up to fit the longest pair).
        self.packed = os.getenv("RERANK_PACKED", "0") not in ("0", "false", "")
        self.pack_width = int(os.getenv("RERANK_PACK_WIDTH", "512"))
        # Inference-time param residency (round-2 verdict item 8 — MFU):
        # flax casts f32 params to the bf16 compute dtype inside EVERY
        # launch, so the f32 master copy is read from HBM (2× traffic)
        # and cast on the VPU each bucket. Pre-cast the body once; the
        # f32 head params stay f32 (they are applied in f32). Compute is
        # bit-identical: promote_dtype(bf16_param) is a no-op cast.
        self._infer_params = self.params
        if jnp.dtype(self.config.dtype) == jnp.bfloat16:
            def cast(x):
                return (
                    x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x
                )

            p = dict(self.params["params"])
            p["body"] = jax.tree.map(cast, p["body"])
            self._infer_params = {**self.params, "params": p}

    @classmethod
    def create(
        cls,
        config: EncoderConfig | None = None,
        tokenizer=None,
        params: dict | None = None,
        seed: int = 0,
    ):
        from .tokenizer import SimpleTokenizer

        config = config or EncoderConfig.tiny()
        if params is None:
            model = CrossEncoder(config)
            rng = jax.random.PRNGKey(seed)
            dummy = jnp.ones((1, 8), jnp.int32)
            params = model.init(rng, dummy, jnp.ones((1, 8), jnp.int32))
        else:
            # checkpoint/torch-loaded params arrive as host numpy; pin
            # once or every jitted call re-uploads the full state
            # (~1 s/call on the TPU tunnel for MB-scale models)
            params = jax.device_put(params)
        return cls(
            config=config,
            params=params,
            # max_length bounded by the model's positions, not the
            # tokenizer default (128 silently truncated ~200-token
            # chunks AND flattened the length distribution)
            tokenizer=tokenizer
            or SimpleTokenizer(
                vocab_size=config.vocab_size,
                max_length=min(512, config.max_position - 2),
            ),
        )

    def _pair_rows(self, queries: list[str], passages: list[str]) -> list[list[int]]:
        tok = self.tokenizer
        ids_q, _ = tok.encode_batch(queries)
        ids_p, _ = tok.encode_batch(passages)
        sep = getattr(tok, "sep_id", 2)
        pad = tok.pad_id
        rows = []
        for q_row, p_row in zip(ids_q, ids_p):
            q_real = [t for t in q_row.tolist() if t != pad]
            p_real = [t for t in p_row.tolist() if t != pad][1:]  # drop CLS
            rows.append(q_real + [sep] + p_real)
        return rows

    def score_pairs_packed(
        self, queries: list[str], passages: list[str], *, width: int | None = None
    ) -> np.ndarray:
        """Score aligned pairs via ragged packing: first-fit-decreasing
        bin-packing of pair rows into fixed ``width`` rows, block-diagonal
        attention (segment ids), per-pair CLS gather. Scores match the
        bucketed path bit-for-bit in f32 and to bf16 tolerance on TPU
        (tests/test_reranker.py) — the layouts are mathematically
        identical; only matmul tiling differs."""
        from .packing import build_packed_arrays, pack_bins, shrink_width

        if not queries:
            return np.zeros(0, np.float32)
        pad = self.tokenizer.pad_id
        rows = self._pair_rows(queries, passages)
        w = width or self.pack_width
        w = max(w, -(-max(len(r) for r in rows) // 128) * 128)
        bins = pack_bins([len(r) for r in rows], w)
        w = shrink_width(bins, w)
        # rows per launch sized so one launch carries ~ a 64×192 bucket's
        # tokens (keeps the dispatch pipeline depth of the bucketed path)
        r_launch = max(1, (64 * 192) // w)
        scores = np.zeros(len(rows), np.float32)
        real_tokens = sum(min(len(r), w) for r in rows)
        padded_tokens = 0
        pending: list[tuple[np.ndarray, jax.Array]] = []
        for s in range(0, len(bins), r_launch):
            ids, seg, cls, idxmat = build_packed_arrays(
                rows, bins[s : s + r_launch], w, pad
            )
            padded_tokens += ids.shape[0] * w
            pending.append((
                idxmat,
                self._apply(
                    self._infer_params,
                    jnp.asarray(ids),
                    jnp.asarray((seg > 0).astype(np.int32)),
                    segment_ids=jnp.asarray(seg),
                    cls_index=jnp.asarray(cls),
                ),
            ))
        for idxmat, out in pending:
            o = np.asarray(out)
            valid = idxmat >= 0
            scores[idxmat[valid]] = o[valid]
        self.last_padding_waste = padded_tokens / max(real_tokens, 1) - 1.0
        return scores

    def score_pairs(
        self,
        queries: list[str],
        passages: list[str],
        *,
        bucket: int = 64,
        packed: bool | None = None,
    ) -> np.ndarray:
        # bucket=64 measured fastest on TPU for 100×200-token pairs
        # (348 ms vs 434 ms at 32 — fewer launch RPCs; vs 392 ms at 128
        # — padding waste): benchmarks/bench_rerank.py
        """Score aligned (query, passage) pairs → [N] f32.

        Pairs are length-bucketed (SURVEY §7.3 #7): sorted by token
        length, batched ``bucket`` at a time, each batch padded to its
        own 32-multiple width — padding waste stays well under 20% for
        natural length distributions, vs padding all N pairs to the
        global max. Widths snap to 32 so compiled shapes are reused
        (64-snap measured 41% waste on ~137-token invoice-chunk pairs:
        every bucket rounded to 192).
        """
        if packed is None:
            packed = self.packed
        if packed:
            return self.score_pairs_packed(queries, passages)
        if not queries:
            return np.zeros(0, np.float32)
        pad = self.tokenizer.pad_id
        rows = self._pair_rows(queries, passages)
        order = sorted(range(len(rows)), key=lambda i: len(rows[i]))
        scores = np.zeros(len(rows), np.float32)
        self.last_padding_waste = 0.0
        real_tokens = padded_tokens = 0
        # Dispatch every bucket before fetching any result: jit dispatch
        # is async, so bucket i+1's host-side padding/transfer overlaps
        # bucket i's device compute, and the per-launch RPC latency of
        # the remote tunnel is paid once, not per bucket (round-2
        # verdict item 8 — a per-bucket np.asarray serialized launches).
        pending: list[tuple[list[int], jax.Array]] = []
        for s in range(0, len(order), bucket):
            idx = order[s : s + bucket]
            chunk = [rows[i] for i in idx]
            width = -(-max(len(r) for r in chunk) // 32) * 32
            ids = np.full((len(idx), width), pad, np.int32)
            mask = np.zeros((len(idx), width), np.int32)
            for j, r in enumerate(chunk):
                r = r[:width]
                ids[j, : len(r)] = r
                mask[j, : len(r)] = 1
            pending.append((
                idx,
                self._apply(
                    self._infer_params, jnp.asarray(ids), jnp.asarray(mask)
                ),
            ))
            real_tokens += sum(min(len(r), width) for r in chunk)
            padded_tokens += len(idx) * width
        for idx, out in pending:
            scores[idx] = np.asarray(out)[: len(idx)]
        self.last_padding_waste = padded_tokens / max(real_tokens, 1) - 1.0
        return scores

    def rerank(
        self, query: str, candidates: list[dict], top_k: int, text_key: str = "text"
    ) -> list[dict]:
        """Rerank candidate hit dicts, returning the top_k with scores in
        ``rerank_score`` (retrieve-100 → rerank-10 per config)."""
        if not candidates:
            return []
        scores = self.score_pairs(
            [query] * len(candidates), [c[text_key] for c in candidates]
        )
        order = np.argsort(-scores)[:top_k]
        out = []
        for rank, i in enumerate(order):
            hit = dict(candidates[int(i)])
            hit["rerank_score"] = float(scores[int(i)])
            hit["rerank_position"] = rank
            out.append(hit)
        return out
