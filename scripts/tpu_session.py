"""One-claim TPU benchmark session.

The axon tunnel's session claim wedges when claims cycle quickly
(round-5 diagnosis: a killed or rapidly-reclaimed session leaves the
far-side grant stale for ~10 minutes, and the next PJRT init blocks in
an uninterruptible futex wait). The robust pattern is therefore ONE
process, ONE claim, MANY benches run sequentially in-process — this
runner. Select benches with TPU_SESSION=comma,list (default: the
round-5 verdict measurement set).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session.py
  TPU_SESSION=headline,sharded_kernel python scripts/tpu_session.py
"""

from __future__ import annotations

import gc
import importlib
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchmarks"),
)

DEFAULT = "headline,sharded_kernel,query_path,spec_rag,encoder_midsize"


def run(name: str) -> None:
    t0 = time.time()
    print(f"### [{time.strftime('%H:%M:%S')}] {name} start",
          file=sys.stderr, flush=True)
    if name == "headline":
        import bench as m
    elif name == "encoder_midsize":
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts"))
        import train_encoder_midsize as m
    else:
        m = importlib.import_module(f"bench_{name}")
    m.main()
    print(
        f"### [{time.strftime('%H:%M:%S')}] {name} done in "
        f"{time.time()-t0:.0f}s", file=sys.stderr, flush=True,
    )


def main() -> None:
    from intool_rag_tpu.backend import ensure_backend

    backend = ensure_backend()
    print(f"### session backend={backend}", file=sys.stderr, flush=True)
    names = os.environ.get("TPU_SESSION", DEFAULT).split(",")
    failures = []
    for name in (n.strip() for n in names if n.strip()):
        try:
            run(name)
        except Exception:
            failures.append(name)
            print(f"### {name} FAILED:", file=sys.stderr)
            traceback.print_exc()
        gc.collect()  # drop the bench's device arrays before the next one
    print(f"### session complete; failures={failures or 'none'}",
          file=sys.stderr, flush=True)
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
