"""In-process TPU text generation behind the BaseLLM port.

The reference's local-generation provider shells out over HTTP to an
Ollama server running llama-family models on CPU (reference:
rag/llm/providers/ollama.py:9-78). This provider is the TPU-native
equivalent: a :class:`~intool_rag_tpu.models.decoder.DecoderLM`
(HF-Llama-compatible) executed in-process — prefill + ``lax.scan``
decode as one compiled XLA program per (bucketed) prompt shape.

Weights resolution:

- ``LLM_MODEL_PATH`` set → load an HF Llama checkpoint from that local
  directory (config.json + pytorch weights + tokenizer). No network.
- unset → a tiny random-weight model with a byte-level tokenizer. This
  serves the full pipeline (useful for latency benchmarks and tests —
  FLOPs and the serving path are weight-independent) but emits
  uninformative text; the factory therefore only selects this provider
  when ``LLM_PROVIDER=tpu`` is explicit.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterator

import numpy as np

from ..config import get_config
from ..llm.base import BaseLLM
from ..logging import get_logger

logger = get_logger(__name__)


class _WaveServer:
    """Multi-tenant serving loop over the slot scheduler.

    Concurrent ``generate()`` calls (HTTP handler threads) enqueue
    (token ids, budget) and block; one worker thread drains the queue in
    WAVES into :class:`~intool_rag_tpu.models.scheduler.
    ContinuousGenerator.generate_many` — within a wave the scheduler
    refills freed slots continuously, so N concurrent requests cost one
    shared decode stream instead of N serialized static batches. A
    short gather window (10 ms) lets near-simultaneous requests join
    the same wave; requests arriving mid-wave start with the next one.
    Greedy outputs are identical to the per-call static path (scheduler
    parity is regression-tested)."""

    def __init__(self, gen) -> None:
        self.gen = gen
        self.q: queue.Queue = queue.Queue()
        self._dead: BaseException | None = None
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def submit(self, ids: list[int], max_new: int) -> list[int]:
        if self._dead is not None:
            raise RuntimeError("LLM wave server is dead") from self._dead
        done = threading.Event()
        box: dict = {}
        self.q.put((ids, max_new, done, box))
        # liveness watchdog, not a latency bound: wakes periodically to
        # fail fast if the worker thread died (a bare wait() would hang
        # this handler thread forever)
        while not done.wait(timeout=5.0):
            if self._dead is not None:
                raise RuntimeError("LLM wave server died") from self._dead
        if "error" in box:
            raise box["error"]
        return box["toks"]

    def _loop(self) -> None:
        try:
            while True:
                wave = [self.q.get()]
                t0 = time.perf_counter()
                while time.perf_counter() - t0 < 0.010:
                    try:
                        wave.append(self.q.get_nowait())
                    except queue.Empty:
                        time.sleep(0.002)
                from ..observability import get_metrics

                m = get_metrics()
                m.inc("llm_waves")
                m.inc("llm_wave_requests", len(wave))
                t_wave = time.perf_counter()
                try:
                    results, stats = self.gen.generate_many(
                        [w[0] for w in wave], [w[1] for w in wave]
                    )
                except Exception as exc:  # surface to every waiter
                    m.inc("llm_wave_errors")
                    for _, _, done, box in wave:
                        box["error"] = exc
                        done.set()
                    continue
                m.observe("llm.wave", time.perf_counter() - t_wave)
                m.inc("llm_wave_tokens", int(stats.get("total_tokens", 0)))
                m.inc("llm_compactions", int(stats.get("compactions", 0)))
                if "tokens_per_wave" in stats:
                    # speculative acceptance: mean emitted tokens per
                    # γ-token verification step (1.0 = all rejected)
                    m.observe(
                        "llm.accepted_per_wave", stats["tokens_per_wave"]
                    )
                for (_, _, done, box), toks in zip(wave, results):
                    box["toks"] = toks
                    done.set()
        except BaseException as exc:  # worker death: fail fast everywhere
            self._dead = exc
            raise


class ByteTokenizer:
    """Invertible UTF-8 byte tokenizer: id = byte + 3 (0=pad, 1=bos, 2=eos)."""

    pad_id = 0
    bos_id = 1
    eos_id = 2
    vocab_size = 256 + 3

    def encode(self, text: str) -> list[int]:
        return [self.bos_id] + [b + 3 for b in text.encode("utf-8")]

    def decode(self, ids) -> str:
        # clamp to the byte range: sampled ids above 258 (possible when the
        # model's vocab is padded past the tokenizer's) would overflow bytes()
        data = bytes(int(i) - 3 for i in ids if 3 <= int(i) <= 258)
        return data.decode("utf-8", errors="replace")


_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _bucket(n: int, buckets=_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class TPULLM(BaseLLM):
    def __init__(
        self,
        config=None,
        params=None,
        tokenizer=None,
        *,
        max_new_tokens: int | None = None,
        temperature: float | None = None,
    ) -> None:
        from ..models.decoder import DecoderConfig, init_decoder_params

        app_cfg = get_config()
        self.temperature = (
            app_cfg.LLM_TEMPERATURE if temperature is None else temperature
        )
        self.max_new_tokens = max_new_tokens or min(app_cfg.LLM_MAX_TOKENS, 256)
        model_path = getattr(app_cfg, "LLM_MODEL_PATH", "")
        if config is not None:
            self.config = config
            self.params = params or init_decoder_params(config)
            self.tokenizer = tokenizer or ByteTokenizer()
        elif model_path:
            self.config, self.params, self.tokenizer = self._load_hf(model_path)
        else:
            logger.warning(
                "TPULLM without LLM_MODEL_PATH: tiny random-weight model "
                "(serving-path benchmarking only — responses are noise)"
            )
            self.config = DecoderConfig(
                vocab_size=ByteTokenizer.vocab_size + 1,
                hidden_size=256,
                num_layers=4,
                num_heads=8,
                num_kv_heads=4,
                intermediate_size=512,
                max_position=1024,
                dtype="float32",
            )
            self.params = init_decoder_params(self.config)
            self.tokenizer = ByteTokenizer()
        # serving is param-read bound: keep one bf16 copy, not an f32
        # master that flax re-casts every step (models/decoder.py
        # cast_params_for_inference; no-op for f32 configs)
        from ..models.decoder import cast_params_for_inference

        self.params = cast_params_for_inference(self.config, self.params)
        self._gen_fns: dict = {}
        self._lock = threading.Lock()
        self._waves: _WaveServer | None = None
        n_slots = get_config().LLM_CONTINUOUS_SLOTS
        if n_slots > 0:
            from ..models.scheduler import ContinuousGenerator

            eos = getattr(self.tokenizer, "eos_id", None)
            if eos is None:
                eos = getattr(self.tokenizer, "eos_token_id", None)
            # LLM_SPECULATIVE_GAMMA composes with continuous batching:
            # each wave verifies gamma tokens per slot (batched
            # prompt-lookup speculation — models/scheduler.py). Greedy
            # serving only; sampling configs fall back to plain waves.
            gamma = get_config().LLM_SPECULATIVE_GAMMA
            spec = gamma if (gamma > 1 and self.temperature <= 0) else 0
            self._waves = _WaveServer(
                ContinuousGenerator(
                    self.config,
                    self.params,
                    n_slots=n_slots,
                    temperature=self.temperature,
                    eos_id=eos,
                    pad_id=getattr(self.tokenizer, "pad_id", 0),
                    top_k=get_config().LLM_TOP_K,
                    top_p=get_config().LLM_TOP_P,
                    speculative_gamma=spec,
                )
            )

    @staticmethod
    def _load_hf(path: str):
        """HF Llama checkpoint from a local directory (no network)."""
        import json
        from pathlib import Path

        from ..models.decoder import DecoderConfig, load_torch_llama

        p = Path(path)
        with open(p / "config.json") as f:
            hf = json.load(f)
        config = DecoderConfig(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            intermediate_size=hf["intermediate_size"],
            max_position=min(hf.get("max_position_embeddings", 2048), 4096),
            rope_theta=hf.get("rope_theta", 10_000.0),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        )
        import torch

        state: dict = {}
        for f in sorted(p.glob("*.safetensors")):
            from safetensors.torch import load_file

            state.update(load_file(f))
        if not state:
            for f in sorted(p.glob("pytorch_model*.bin")):
                state.update(torch.load(f, map_location="cpu", weights_only=True))
        params = load_torch_llama(config, state)
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(str(p), local_files_only=True)
        return config, params, tok

    # ---------------- BaseLLM port ----------------

    def _generate_fn(self, prompt_bucket: int):
        from ..models.decoder import make_generate_fn

        key = prompt_bucket
        with self._lock:
            if key not in self._gen_fns:
                eos = getattr(self.tokenizer, "eos_id", None)
                if eos is None:
                    eos = getattr(self.tokenizer, "eos_token_id", None)
                app_cfg = get_config()
                self._gen_fns[key] = make_generate_fn(
                    self.config,
                    max_new_tokens=min(
                        self.max_new_tokens,
                        max(1, self.config.max_position - prompt_bucket),
                    ),
                    temperature=self.temperature,
                    eos_id=eos,
                    pad_id=getattr(self.tokenizer, "pad_id", 0),
                    top_k=app_cfg.LLM_TOP_K,
                    top_p=app_cfg.LLM_TOP_P,
                )
            return self._gen_fns[key]

    def _speculative_fn(self, prompt_bucket: int, gamma: int):
        from ..models.decoder import make_lookup_speculative_fn

        key = ("spec", prompt_bucket, gamma)
        with self._lock:
            if key not in self._gen_fns:
                eos = getattr(self.tokenizer, "eos_id", None)
                if eos is None:
                    eos = getattr(self.tokenizer, "eos_token_id", None)
                # cache must hold prompt + generation + draft overhang
                budget = self.config.max_position - prompt_bucket - gamma
                self._gen_fns[key] = make_lookup_speculative_fn(
                    self.config,
                    max_new_tokens=max(1, min(self.max_new_tokens, budget)),
                    gamma=gamma,
                    eos_id=eos,
                    pad_id=getattr(self.tokenizer, "pad_id", 0),
                )
            return self._gen_fns[key]

    def _encode_prompt(self, prompt: str) -> tuple[np.ndarray, np.ndarray]:
        if hasattr(self.tokenizer, "encode") and not hasattr(
            self.tokenizer, "eos_token_id"
        ):
            ids = self.tokenizer.encode(prompt)
        else:  # HF tokenizer
            ids = self.tokenizer(prompt)["input_ids"]
        # keep at most min(position budget, largest bucket) tokens: _bucket()
        # caps at its last entry, so a longer kept prompt would make
        # pad = bucket - len(ids) negative and break the slice below
        limit = min(
            self.config.max_position - self.max_new_tokens, _BUCKETS[-1]
        )
        ids = ids[-max(8, limit):]
        bucket = _bucket(len(ids))
        pad = bucket - len(ids)
        arr = np.full((1, bucket), getattr(self.tokenizer, "pad_id", 0), np.int32)
        mask = np.zeros((1, bucket), np.int32)
        arr[0, pad:] = ids
        mask[0, pad:] = 1
        return arr, mask

    def generate(self, prompt: str, **kwargs) -> str:
        import jax

        ids, mask = self._encode_prompt(prompt)
        if self._waves is not None:
            # continuous-batching path: concurrent calls share one slot
            # scheduler (the scheduler strips EOS and enforces budgets
            # on device). The prompt must leave room for the FULL
            # generation: compaction re-prefills prompt+generated into a
            # power-of-2 bucket, so the cap bounds
            # bucket(prompt + max_new) + seg_len ≤ max_position — a cap
            # on the prompt alone crashes mid-serving once the cursor
            # overruns (takes the whole wave down). Keep the TAIL (RAG
            # prompts end with the question).
            raw = [int(t) for t, m in zip(ids[0], mask[0]) if m]
            seg = self._waves.gen.segment_advance
            budget = self.config.max_position - seg
            # largest power-of-2 history bucket that fits (buckets round
            # up to powers of 2, so prompt+generated must stay ≤ this)
            p2f = 1 << (max(budget, 8).bit_length() - 1)
            new_eff = max(1, min(self.max_new_tokens, p2f - 8))
            cap = 8
            while 2 * cap + new_eff <= p2f:
                cap *= 2
            toks = self._waves.submit(raw[-cap:], new_eff)
            return self.tokenizer.decode(toks)
        gamma = get_config().LLM_SPECULATIVE_GAMMA
        if gamma > 0 and self.temperature <= 0.0:
            # single-stream greedy: prompt-lookup speculation (exact
            # greedy parity; RAG answers quote context, so drafts hit)
            fn = self._speculative_fn(ids.shape[1], gamma)
            toks = np.asarray(fn(self.params, ids, mask))
            eos = getattr(self.tokenizer, "eos_id", None) or getattr(
                self.tokenizer, "eos_token_id", None
            )
            out = []
            for t in toks:
                if eos is not None and int(t) == int(eos):
                    break
                out.append(int(t))
            return self.tokenizer.decode(out)
        fn = self._generate_fn(ids.shape[1])
        seed = abs(hash(prompt)) % (2**31)
        toks = np.asarray(fn(self.params, ids, mask, jax.random.PRNGKey(seed)))[0]
        eos = getattr(self.tokenizer, "eos_id", None) or getattr(
            self.tokenizer, "eos_token_id", None
        )
        out = []
        for t in toks:
            if eos is not None and int(t) == int(eos):
                break
            out.append(int(t))
        return self.tokenizer.decode(out)

    def generate_stream(self, prompt: str, **kwargs) -> Iterator[str]:
        text = self.generate(prompt, **kwargs)
        step = 32
        for i in range(0, len(text), step):
            yield text[i : i + step]

    def is_ready(self) -> bool:
        return True

    def get_info(self) -> dict:
        return {
            "provider": "TPULLM",
            "layers": self.config.num_layers,
            "hidden": self.config.hidden_size,
            "max_position": self.config.max_position,
        }
