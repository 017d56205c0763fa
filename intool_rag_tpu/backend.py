"""Backend initialization guard.

The TPU can be single-tenant (the axon tunnel admits one process); a
service or tool that cannot claim it must degrade to CPU instead of
failing every request. Call :func:`ensure_backend` once at process
startup before any jax computation.
"""

from __future__ import annotations

from .logging import get_logger

logger = get_logger(__name__)

_checked = False


def ensure_backend() -> str:
    """Returns the active backend name, falling back to CPU if the
    configured accelerator backend cannot initialize."""
    global _checked
    import jax

    if not _checked:
        try:
            jax.devices()
        except Exception as exc:
            logger.warning(
                "accelerator backend unavailable (%s) — falling back to CPU", exc
            )
            jax.config.update("jax_platforms", "cpu")
            jax.devices()
        _checked = True
    return jax.default_backend()
