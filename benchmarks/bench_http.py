"""HTTP-service-level benchmark (round-4 verdict item 1b): QPS and
p50/p99 through the REAL service — HTTP parsing, registry, the query
micro-batcher (service/batcher.py), retrieval, response assembly —
under concurrent client load. The kernel headline (bench.py) measures
none of those layers; this closes the kernel-vs-service gap in the
BENCH_NOTES table.

Method: spawns the service as a subprocess (offline providers unless
EMBEDDING_PROVIDER overrides), ingests BENCH_HTTP_DOCS synthetic text
documents through POST /ingest (measures service-level ingest), then
drives POST /search (retrieval path, no LLM) and POST /query (full
path, fake LLM) at several concurrency levels with a thread-pool
client. The bench process itself never imports jax — the service owns
the accelerator claim.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_http.py
  EMBEDDING_PROVIDER=tpu BENCH_HTTP_DOCS=48 ... python benchmarks/bench_http.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request

PORT = int(os.environ.get("BENCH_HTTP_PORT", "8057"))
BASE = f"http://127.0.0.1:{PORT}"
DOCS = int(os.environ.get("BENCH_HTTP_DOCS", "24"))
PARAS_PER_DOC = 40
REQS = int(os.environ.get("BENCH_HTTP_REQS", "400"))


# the bench process never imports jax; common.py only needs numpy
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import emit  # noqa: E402


def post(path: str, data: bytes, content_type: str, timeout=120):
    req = urllib.request.Request(
        BASE + path, data=data, headers={"Content-Type": content_type}
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def multipart(filename: str, payload: bytes) -> tuple[bytes, str]:
    b = b"----benchboundary"
    body = (
        b"--" + b + b"\r\n"
        b'Content-Disposition: form-data; name="file"; filename="'
        + filename.encode() + b'"\r\n'
        b"Content-Type: text/plain\r\n\r\n" + payload + b"\r\n--" + b + b"--\r\n"
    )
    return body, f"multipart/form-data; boundary={b.decode()}"


def main() -> None:
    import numpy as np

    rng = np.random.default_rng(0)
    words = [f"term{i}" for i in range(4000)] + [
        "invoice", "total", "shipping", "warranty", "calibration",
        "manifest", "ledger", "quarterly", "balance", "discount",
    ]
    storage = tempfile.mkdtemp(prefix="bench_http_")
    env = os.environ.copy()
    env.setdefault("EMBEDDING_PROVIDER", "hash")
    env.setdefault("LLM_PROVIDER", "fake")
    env.setdefault("SEMANTIC_PROVIDER", "heuristic")
    env["STORAGE_DIR"] = storage
    # hermetic caches: the query-result cache is DISK-backed under
    # CACHE_DIR (default ./storages/cache) and its key (question,
    # project, params, corpus version) collides across bench runs —
    # a prior run's /query results served this run's /query phase at
    # 812 "QPS" (round-5 false measurement) until this isolation
    env["CACHE_DIR"] = os.path.join(storage, "cache")
    env["UPLOAD_DIR"] = os.path.join(storage, "uploads")
    provider = env["EMBEDDING_PROVIDER"]
    svc = subprocess.Popen(
        [sys.executable, "-m", "intool_rag_tpu.service", "--port", str(PORT)],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        for _ in range(300):
            try:
                health = json.loads(
                    urllib.request.urlopen(BASE + "/health", timeout=5).read()
                )
                break
            except Exception:
                time.sleep(1.0)
        else:
            raise RuntimeError("service did not come up")
        backend = health.get("backend", "?")
        print(f"# service up, backend={backend}, provider={provider}",
              file=sys.stderr, flush=True)

        # ---- service-level ingest ----
        t0 = time.perf_counter()
        chunks = 0
        for d in range(DOCS):
            paras = []
            for _ in range(PARAS_PER_DOC):
                paras.append(" ".join(rng.choice(words, size=80)))
            payload = ("\n\n".join(paras)).encode()
            body, ctype = multipart(f"doc{d}.txt", payload)
            out = post(f"/ingest?project=bench", body, ctype, timeout=600)
            assert out.get("success"), out
            chunks += out.get("total_chunks", 0)
        ingest_s = time.perf_counter() - t0
        emit("http_ingest_docs_per_s", DOCS / ingest_s, "docs/s",
             docs=DOCS, chunks=chunks, backend=backend, provider=provider)

        # ---- concurrent query load ----
        questions = [
            f"what is the {rng.choice(words)} of {rng.choice(words)}"
            for _ in range(256)
        ]

        def run_load(path: str, body_of, concurrency: int, n: int):
            latencies = []
            errors = []
            lock = threading.Lock()
            idx = iter(range(n))

            def worker():
                # a failed request must not silently kill the worker:
                # QPS is computed over COMPLETED requests and the error
                # count is reported (round-5 review — a single 500/
                # timeout corrupted qps=n/wall and could IndexError the
                # percentile on an empty list)
                while True:
                    with lock:
                        i = next(idx, None)
                    if i is None:
                        return
                    q = questions[i % len(questions)]
                    t0 = time.perf_counter()
                    try:
                        post(path, *body_of(q))
                    except Exception as exc:
                        with lock:
                            errors.append(repr(exc))
                        continue
                    dt = time.perf_counter() - t0
                    with lock:
                        latencies.append(dt)

            t0 = time.perf_counter()
            threads = [threading.Thread(target=worker) for _ in range(concurrency)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            latencies.sort()
            if not latencies:
                raise RuntimeError(
                    f"every request failed ({len(errors)} errors; "
                    f"first: {errors[0] if errors else '?'})"
                )
            return {
                "qps": len(latencies) / wall,
                "p50_ms": latencies[len(latencies) // 2] * 1000,
                "p99_ms": latencies[int(len(latencies) * 0.99)] * 1000,
                "errors": len(errors),
            }

        def search_body(q):
            return (json.dumps({"question": q, "top_k": 10}).encode(),
                    "application/json")

        def query_body(q):
            return (json.dumps({"question": q}).encode(), "application/json")

        run_load("/search", search_body, 4, 40)  # warm compile
        for conc in (1, 8, 32):
            # warm THIS concurrency level first: each new micro-batch
            # bucket (powers of two up to conc) compiles a fresh
            # program — ~30-60 s each through the remote-compile
            # tunnel — which must not land inside the timed window
            run_load("/search", search_body, conc, max(conc * 3, 8))
            r = run_load("/search", search_body, conc, REQS)
            emit("http_search_qps", r["qps"], "queries/s",
                 concurrency=conc, p50_ms=round(r["p50_ms"], 1),
                 p99_ms=round(r["p99_ms"], 1), backend=backend,
                 provider=provider, corpus_chunks=chunks,
                 errors=r["errors"])
        # warm the /query path with questions DISJOINT from the timed
        # set under ANY BENCH_HTTP_REQS (the query-result cache is
        # keyed by question text — an overlap serves timed requests
        # from cache; the emitted cache_hits field is the tripwire)
        def warm_query_body(q):
            return (json.dumps({"question": "[warmup] " + q}).encode(),
                    "application/json")

        run_load("/query", warm_query_body, 8, 24)
        r = run_load("/query", query_body, 8, REQS // 2)
        try:
            qc = json.loads(
                urllib.request.urlopen(BASE + "/metrics", timeout=10).read()
            ).get("query_cache") or {}
        except Exception:
            qc = {}
        emit("http_query_qps", r["qps"], "queries/s",
             concurrency=8, p50_ms=round(r["p50_ms"], 1),
             p99_ms=round(r["p99_ms"], 1), backend=backend,
             provider=provider, cache_hits=qc.get("hits", 0),
             errors=r["errors"])

        # batcher effectiveness snapshot
        try:
            m = json.loads(urllib.request.urlopen(BASE + "/metrics", timeout=10).read())
            b = m.get("batcher") or {}
            if b.get("batches_run"):
                emit("http_batcher_requests_per_batch",
                     b["requests_served"] / b["batches_run"], "reqs/batch",
                     **b)
        except Exception:
            pass
    finally:
        svc.terminate()
        try:
            svc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            svc.kill()


if __name__ == "__main__":
    main()
