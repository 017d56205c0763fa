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


def ensure_backend(retries: int = 2, delay_s: float = 5.0) -> str:
    """Returns the active backend name, falling back to CPU if the
    configured accelerator backend cannot initialize.

    The accelerator claim can be transiently held by an exiting process
    (single-tenant tunnels), so initialization retries with backoff
    before degrading.
    """
    global _checked
    import os
    import time

    import jax

    if not _checked:
        if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
            # honor an explicit CPU request: the axon sitecustomize
            # re-registers the accelerator at interpreter start and
            # swallows the env var, so a service launched with
            # JAX_PLATFORMS=cpu would otherwise still claim the
            # single-tenant TPU (and steal it from a training run)
            jax.config.update("jax_platforms", "cpu")
        if not _accelerator_probe_ok():
            # a dead tunnel relay makes the PJRT C-API client BLOCK
            # FOREVER inside make_c_api_client — no Python exception
            # ever fires, so the retry loop below can't save us and an
            # in-process watchdog can't either (the hung init holds the
            # backend lock). Probe in a SUBPROCESS with a timeout and
            # force CPU before this process touches the backend.
            logger.warning(
                "accelerator probe timed out/failed — forcing CPU "
                "(tunnel relay down?)"
            )
            jax.config.update("jax_platforms", "cpu")
        for attempt in range(retries + 1):
            try:
                jax.devices()
                break
            except Exception as exc:
                if attempt < retries:
                    logger.warning(
                        "accelerator init failed (%s) — retrying in %.0fs",
                        exc, delay_s,
                    )
                    time.sleep(delay_s)
                    _retry_axon_registration()
                else:
                    logger.warning(
                        "accelerator backend unavailable (%s) — falling back "
                        "to CPU", exc,
                    )
                    jax.config.update("jax_platforms", "cpu")
                    jax.devices()
        _warmup()
        _checked = True
    return jax.default_backend()


def _accelerator_probe_ok(timeout_s: float | None = None) -> bool:
    """True when ``jax.devices()`` completes in a fresh subprocess
    within ``timeout_s`` (env ``BACKEND_PROBE_TIMEOUT``, default 90 s).

    Skipped (returns True) when no accelerator plugin is in play or the
    process already forces CPU — the probe costs one interpreter start,
    only worth it when a hang is possible."""
    import os
    import subprocess
    import sys

    import jax

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    try:
        if jax.config.jax_platforms == "cpu":
            return True
    except Exception:
        pass
    if os.environ.get("AXON_LOOPBACK_RELAY"):
        # Loopback-relay environments: the relay is a dumb TCP↔stdio
        # pump whose listeners exist exactly while the pump process
        # lives, so "relay down" is detectable PASSIVELY from
        # /proc/net/tcp — no claim needed. The old jax.devices()
        # subprocess probe claimed and released the single-tenant
        # tunnel, and the immediate re-claim by this process then
        # wedged PJRT init in an uninterruptible futex wait (reproduced
        # repeatedly in round 5, including with a 6 s cooldown); the
        # passive check removes the claim-cycle trigger entirely.
        return _loopback_relay_listening()
    if timeout_s is None:
        timeout_s = float(os.environ.get("BACKEND_PROBE_TIMEOUT", "90"))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def _loopback_relay_listening(
    lo: int = 8080, hi: int = 8200, min_ports: int = 4
) -> bool:
    """True when the loopback axon relay's listener pool is up: at
    least ``min_ports`` loopback TCP listeners in [lo, hi) per
    /proc/net/tcp (state 0A = LISTEN, addr 0100007F = 127.0.0.1).

    ``lo`` starts at 8080, NOT 8000: this project's own servers bind
    8001 (service default) and 8050-8079 (benches/drives), and counting
    them as "relay listeners" would mask a dead relay exactly when a
    service is up (round-5 review). The relay pool observed in this
    environment listens on ~12 ports in 8082-8117; the probe is
    v4-loopback only by design (the relay is a 127.0.0.1 TCP↔stdio
    pump) — a relay on ::1/0.0.0.0 would read as down and degrade to
    CPU, the safe direction."""
    try:
        found = 0
        with open("/proc/net/tcp", encoding="ascii") as fh:
            next(fh)
            for line in fh:
                parts = line.split()
                local, state = parts[1], parts[3]
                if state != "0A":
                    continue
                addr, _, port_hex = local.partition(":")
                if addr != "0100007F":
                    continue
                if lo <= int(port_hex, 16) < hi:
                    found += 1
                    if found >= min_ports:
                        return True
        return False
    except Exception:
        return True  # can't inspect — assume alive, normal init applies


def _warmup() -> None:
    """Run one tiny computation + host fetch on the calling thread.

    The axon PJRT client lazily finishes initialization on the first
    computation; if that first computation happens on a non-main thread
    (e.g. an HTTP handler thread), the device→host fetch deadlocks for
    minutes. Forcing the init here — ensure_backend is called from the
    main thread at process startup — makes later worker-thread device
    work safe. (Found via a hung ``POST /ingest``: the handler thread
    blocked inside ``np.asarray`` at chunk_store.py append.)
    """
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.zeros(8))


def _retry_axon_registration() -> None:
    """The axon plugin registers in sitecustomize at interpreter start; a
    transiently-held tunnel claim makes that registration fail silently
    and every later jax.devices() raise. Re-attempt the registration the
    same way sitecustomize does (no-op outside axon environments)."""
    import os
    import uuid

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    try:
        import sys

        axon_site = os.path.expanduser("~/.axon_site")
        if os.path.isdir(axon_site) and axon_site not in sys.path:
            sys.path.insert(0, axon_site)
        from axon.register import register

        register(
            None,
            f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
            so_path="/opt/axon/libaxon_pjrt.so",
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
        )
    except Exception as exc:  # already registered / still claimed
        logger.debug("axon re-registration attempt failed: %s", exc)
