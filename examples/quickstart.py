"""Library quickstart: index a text corpus and run hybrid search, no
service needed.

    python examples/quickstart.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from intool_rag_tpu.backend import ensure_backend
from intool_rag_tpu.eval.harness import build_engine_from_texts
from intool_rag_tpu.providers.hash_embed import HashEmbeddingProvider

CORPUS = [
    "The warranty covers manufacturing defects for 24 months.",
    "Returns are accepted within 30 days with a valid receipt.",
    "Shipping is free for orders above 50 dollars.",
    "发票金额总计人民币五千元整",
    "Our support team answers within one business day.",
]


def main() -> None:
    print("backend:", ensure_backend())
    provider = HashEmbeddingProvider(256)  # swap for TPUEmbeddingProvider
    engine = build_engine_from_texts(CORPUS, provider)
    for question in ("how long is the warranty?", "发票 金额"):
        emb = provider.embed_batch([question], is_query=True)
        import jax.numpy as jnp

        vals, rows = engine.search([question], jnp.asarray(emb), k=2)
        print(f"\nQ: {question}")
        for score, row in zip(np.asarray(vals)[0], np.asarray(rows)[0]):
            if row >= 0 and np.isfinite(score):
                print(f"  {score:.3f}  {CORPUS[int(row)]}")


if __name__ == "__main__":
    main()
