"""On-device BM25 scoring over CSC (term→postings) arrays.

The sparse half of hybrid search — a capability the reference declares
(rag/config.py:43-45, README.md:54-58) but never implemented. Scoring is
the exact sparse algorithm, not a dense emulation: per query term, gather
that term's postings slice (document ids + precomputed tf-normalized
weights) and scatter-add ``idf · weight`` into the score vector. Work is
O(Q · Σ df(term)) — the information-theoretic minimum — instead of
O(Q · N · L) for a dense membership scan.

Postings layout (built by :mod:`intool_rag_tpu.index.bm25_index`):

- ``post_docs  [nnz + p_max] i32`` — doc ids, flat, grouped by term,
  impact-ordered (highest weight first) within each term, tail-padded.
- ``post_w     [nnz + p_max] f32`` — tf-normalized weights
  ``tf·(k1+1) / (tf + k1·(1-b+b·len/avglen))`` (idf applied at query time).
- ``term_start [V] i32``, ``term_len [V] i32`` — per-term slice bounds.
- ``idf        [V] f32``.

Terms with df > ``p_max`` are impact-pruned to their ``p_max`` strongest
postings (bounded, idf-weighted error — standard impact pruning; such
terms are near-stopwords with tiny idf).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_docs", "p_max"))
def bm25_scores(
    qterms: jax.Array,  # [Q, T] i32 vocab ids, -1 padding
    qtf: jax.Array,  # [Q, T] f32 query-side term counts (0 for padding)
    term_start: jax.Array,  # [V] i32
    term_len: jax.Array,  # [V] i32
    post_docs: jax.Array,  # [nnz_pad] i32
    post_w: jax.Array,  # [nnz_pad] f32
    idf: jax.Array,  # [V] f32
    *,
    n_docs: int,
    p_max: int,
) -> jax.Array:
    """Exact BM25 scores ``[Q, n_docs] f32`` (up to impact pruning)."""

    def score_one(terms_row: jax.Array, qtf_row: jax.Array) -> jax.Array:
        def body(scores: jax.Array, inputs):
            t, q_tf = inputs
            valid = t >= 0
            t_safe = jnp.maximum(t, 0)
            start = term_start[t_safe]
            length = jnp.minimum(term_len[t_safe], p_max)
            docs = jax.lax.dynamic_slice(post_docs, (start,), (p_max,))
            w = jax.lax.dynamic_slice(post_w, (start,), (p_max,))
            pos = jax.lax.broadcasted_iota(jnp.int32, (p_max, 1), 0)[:, 0]
            mask = (pos < length) & valid
            # clamp ≥ 0 (same contract as bm25_topk_sorted: BM25
            # contributions are non-negative by construction)
            contrib = jnp.maximum(jnp.where(mask, w * idf[t_safe] * q_tf, 0.0), 0.0)
            docs = jnp.where(mask, docs, n_docs)  # padding -> dropped slot
            scores = scores.at[docs].add(contrib, mode="drop")
            return scores, None

        init = jnp.zeros((n_docs,), jnp.float32)
        scores, _ = jax.lax.scan(body, init, (terms_row, qtf_row))
        return scores

    return jax.vmap(score_one)(qterms, qtf)


@functools.partial(jax.jit, static_argnames=("k", "n_docs", "p_max"))
def bm25_topk(
    qterms: jax.Array,
    qtf: jax.Array,
    term_start: jax.Array,
    term_len: jax.Array,
    post_docs: jax.Array,
    post_w: jax.Array,
    idf: jax.Array,
    k: int,
    *,
    n_docs: int,
    p_max: int,
) -> tuple[jax.Array, jax.Array]:
    scores = bm25_scores(
        qterms, qtf, term_start, term_len, post_docs, post_w, idf,
        n_docs=n_docs, p_max=p_max,
    )
    k = min(k, n_docs)
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "n_docs", "p_max", "use_approx"))
def bm25_topk_sorted(
    qterms: jax.Array,  # [Q, T] i32, -1 padding
    qtf: jax.Array,  # [Q, T] f32
    term_start: jax.Array,
    term_len: jax.Array,
    post_docs: jax.Array,
    post_w: jax.Array,
    idf: jax.Array,
    k: int,
    *,
    n_docs: int,
    p_max: int,
    use_approx: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Scatter-free BM25 top-k: gather each query term's postings slice,
    then aggregate duplicate doc ids with one batched sort + a vectorized
    segmented sum (cumsum minus a cummax-propagated segment base — valid
    because contributions are ≥ 0 so the cumsum is nondecreasing), then
    top-k. TPU scatter serializes; sort+scan is vectorized VPU work, which
    makes this ~2× faster end-to-end at Q=256, T=32, p_max=2048.
    """
    q, t = qterms.shape

    def gather_one(terms_row, qtf_row):
        def per_term(term, q_tf):
            valid = term >= 0
            t_safe = jnp.maximum(term, 0)
            start = term_start[t_safe]
            length = jnp.minimum(term_len[t_safe], p_max)
            docs = jax.lax.dynamic_slice(post_docs, (start,), (p_max,))
            w = jax.lax.dynamic_slice(post_w, (start,), (p_max,))
            pos = jax.lax.broadcasted_iota(jnp.int32, (p_max, 1), 0)[:, 0]
            mask = (pos < length) & valid
            # PRECONDITION of the cummax segmented sum below: contributions
            # must be ≥ 0. True BM25 contributions always are (Lucene idf
            # ≥ 0, tf-norm weights ≥ 0, query tf ≥ 0); clamp defensively so
            # corrupted inputs degrade gracefully instead of silently
            # corrupting unrelated totals.
            contrib = jnp.maximum(jnp.where(mask, w * idf[t_safe] * q_tf, 0.0), 0.0)
            docs = jnp.where(mask, docs, n_docs)  # sentinel sorts last
            return docs, contrib

        docs, contrib = jax.vmap(per_term)(terms_row, qtf_row)
        return docs.reshape(-1), contrib.reshape(-1)

    docs, contrib = jax.vmap(gather_one)(qterms, qtf)  # [Q, M]

    # sort by doc id, co-sorting contributions
    docs_s, contrib_s = jax.lax.sort_key_val(docs, contrib, dimension=1)
    cs = jnp.cumsum(contrib_s, axis=1)
    excl = cs - contrib_s
    prev = jnp.concatenate(
        [jnp.full((q, 1), -1, docs_s.dtype), docs_s[:, :-1]], axis=1
    )
    nxt = jnp.concatenate(
        [docs_s[:, 1:], jnp.full((q, 1), jnp.iinfo(jnp.int32).max, docs_s.dtype)],
        axis=1,
    )
    is_start = docs_s != prev
    is_end = docs_s != nxt
    # Segment total at end i = cs[i] − excl[segment start], with the base
    # forward-filled by cummax — valid because excl is nondecreasing under
    # the non-negative-contribution precondition enforced above.
    base = jax.lax.cummax(jnp.where(is_start, excl, -1.0), axis=1)
    totals = cs - base
    valid = is_end & (docs_s < n_docs)
    slot_scores = jnp.where(valid, totals, -jnp.inf)

    k_eff = min(k, slot_scores.shape[1])
    if use_approx:
        # CAUTION: after the doc-id sort, distinct docs' segment-end slots
        # are adjacent, so approx_max_k's per-group max discards most
        # candidates (measured recall 0.21). Kept only for experimentation;
        # the default blocked_topk below is exact AND fast.
        vals, pos = jax.lax.approx_max_k(slot_scores, k_eff)
    else:
        from .topk import blocked_topk

        vals, pos = blocked_topk(slot_scores, k_eff, block=1024)
    ids = jnp.take_along_axis(docs_s, pos, axis=1)
    # normalize empty slots to (0.0, id 0) — same contract as the scatter
    # variant (callers mask on score > 0)
    finite = jnp.isfinite(vals)
    return jnp.where(finite, vals, 0.0), jnp.where(finite, ids, 0)


def build_padded_layout(
    term_start: "np.ndarray",
    term_len: "np.ndarray",
    post_docs: "np.ndarray",
    post_w: "np.ndarray",
    *,
    n_docs: int,
    p_max: int,
    cold_width: int = 64,
):
    """Repack 1-D postings into the two-tier ROW layout the TPU gather
    wants (round-3 finding: the vmapped dynamic-slice gather ran at
    ~1.2 GB/s — 6.9 ms/batch, the dominant BM25 stage cost — while an
    aligned row gather from a 2-D array runs 3.6× faster).

    Terms with ≤ ``cold_width`` postings go to a narrow [C, cold_width]
    matrix, the rest (impact-capped at ``p_max``) to [H, p_max]; each
    term is exactly one row of its tier, so the query-side gather is two
    `take(axis=0)` row gathers. Two tiers bound the padding waste that a
    single [V, p_max] layout would pay on rare terms (real vocabularies
    are zipf: most terms have tiny df).

    Returns dict of numpy arrays: term_row [V], term_hot [V] bool,
    hot_docs [H, p_max], hot_w, cold_docs [C, cold_width], cold_w.
    """
    import numpy as np

    v = len(term_start)
    capped = np.minimum(term_len, p_max)
    hot = capped > cold_width
    term_row = np.zeros(v, np.int32)
    term_row[hot] = np.arange(int(hot.sum()), dtype=np.int32)
    term_row[~hot] = np.arange(v - int(hot.sum()), dtype=np.int32)
    h = max(int(hot.sum()), 1)
    c = max(v - int(hot.sum()), 1)
    hot_docs = np.full((h, p_max), n_docs, np.int32)
    hot_w = np.zeros((h, p_max), np.float32)
    cold_docs = np.full((c, cold_width), n_docs, np.int32)
    cold_w = np.zeros((c, cold_width), np.float32)
    # vectorized scatter: pair i of term t sits at 1-D position
    # term_start[t] + j  →  2-D (term_row[t], j) in its tier
    capped64 = capped.astype(np.int64)
    total = int(capped64.sum())
    row_of_pair = np.repeat(term_row, capped64)
    hot_of_pair = np.repeat(hot, capped64)
    col_of_pair = np.arange(total, dtype=np.int64) - np.repeat(
        term_start.astype(np.int64), capped64
    )
    src_docs = post_docs[:total]
    src_w = post_w[:total]
    hp = hot_of_pair
    hot_docs[row_of_pair[hp], col_of_pair[hp]] = src_docs[hp]
    hot_w[row_of_pair[hp], col_of_pair[hp]] = src_w[hp]
    cp = ~hot_of_pair
    cold_docs[row_of_pair[cp], col_of_pair[cp]] = src_docs[cp]
    cold_w[row_of_pair[cp], col_of_pair[cp]] = src_w[cp]
    return {
        "term_row": term_row,
        "term_hot": hot,
        "hot_docs": hot_docs,
        "hot_w": hot_w,
        "cold_docs": cold_docs,
        "cold_w": cold_w,
    }


@functools.partial(
    jax.jit, static_argnames=("n_docs", "p_max", "cold_width")
)
def build_padded_layout_device(
    term_start: jax.Array,  # [V] i32
    term_len: jax.Array,  # [V] i32
    post_docs: jax.Array,  # [nnz_pad] i32 (device-resident)
    post_w: jax.Array,  # [nnz_pad] f32
    hot_terms: jax.Array,  # [H] i32 — term ids with capped len > cold_width
    cold_terms: jax.Array,  # [C] i32
    *,
    n_docs: int,
    p_max: int,
    cold_width: int = 64,
):
    """Device-side construction of the two-tier row layout from the 1-D
    postings already in HBM. Only the tiny per-term id vectors cross the
    host→device boundary — round-3 lesson: uploading the ~0.4 GB padded
    arrays through the remote tunnel stalls (CLAUDE.md multi-GB-upload
    hang); a one-time on-device gather (~0.4 s at 1M×64) does not.
    Returns (hot_docs, hot_w, cold_docs, cold_w) device arrays."""

    def tier(terms, width):
        starts = term_start[terms]  # [R]
        lens = jnp.minimum(term_len[terms], width)
        idx = starts[:, None] + jnp.arange(width)[None, :]
        valid = jnp.arange(width)[None, :] < lens[:, None]
        idx = jnp.clip(idx, 0, post_docs.shape[0] - 1)
        docs = jnp.where(valid, post_docs[idx], n_docs)
        w = jnp.where(valid, post_w[idx], 0.0)
        return docs.astype(jnp.int32), w.astype(jnp.float32)

    hot_docs, hot_w = tier(hot_terms, p_max)
    cold_docs, cold_w = tier(cold_terms, cold_width)
    return hot_docs, hot_w, cold_docs, cold_w


def build_row_layout(
    term_start: jax.Array,  # [V] i32 (device)
    term_len: jax.Array,  # [V] i32
    post_docs: jax.Array,  # [nnz_pad] i32
    post_w: jax.Array,  # [nnz_pad] f32
    *,
    n_docs: int,
    p_max: int,
    cold_width: int = 64,
) -> dict:
    """ONE constructor for the two-tier row layout + packed-quantization
    stats, shared by BM25Index, bench.py and bench_stages.py (review
    finding: three hand-rolled copies drifted apart). Host work is the
    tiny [V] hot/cold split; the padded tier matrices build ON DEVICE
    from the 1-D postings already in HBM (uploading the padded arrays
    through the tunnel stalls — round-3 lesson), as does ``term_wmax``
    (first posting per term = its max, by impact order).

    Returns dict: term_row [V], term_hot [V] bool, hot_docs/hot_w,
    cold_docs/cold_w, term_wmax [V] — the exact argument set of
    :func:`bm25_topk_rows` / :func:`bm25_topk_rows_packed`."""
    import numpy as np

    lens = np.minimum(np.asarray(term_len), p_max)
    hot = lens > cold_width
    term_row = np.zeros(len(lens), np.int32)
    term_row[hot] = np.arange(int(hot.sum()), dtype=np.int32)
    term_row[~hot] = np.arange(len(lens) - int(hot.sum()), dtype=np.int32)
    hot_terms = np.flatnonzero(hot).astype(np.int32)
    cold_terms = np.flatnonzero(~hot).astype(np.int32)
    if len(hot_terms) == 0:
        hot_terms = np.zeros(1, np.int32)
    if len(cold_terms) == 0:
        cold_terms = np.zeros(1, np.int32)
    hd, hw, cd, cw = build_padded_layout_device(
        term_start, term_len, post_docs, post_w,
        jnp.asarray(hot_terms), jnp.asarray(cold_terms),
        n_docs=n_docs, p_max=p_max, cold_width=cold_width,
    )
    wmax = jnp.where(
        term_len > 0,
        post_w[jnp.clip(term_start, 0, post_w.shape[0] - 1)],
        0.0,
    ).astype(jnp.float32)
    return {
        "term_row": jnp.asarray(term_row),
        "term_hot": jnp.asarray(hot),
        "hot_docs": hd, "hot_w": hw,
        "cold_docs": cd, "cold_w": cw,
        "term_wmax": wmax,
        # host copy for query-side hot-first packing (tiny [V] bool)
        "term_hot_np": hot,
    }


def _aggregate_topk_packed(
    docs: jax.Array,  # [Q, M] i32, sentinel n_docs for padding
    contrib: jax.Array,  # [Q, M] f32, ≥ 0
    k: int,
    n_docs: int,
    qbits: int,
    scale: jax.Array | None = None,  # [Q, 1] f32 quantization step · levels⁻¹
):
    """Packed-key candidate aggregation: quantize each contribution to
    ``qbits`` levels, pack ``doc_id·2^qbits + level`` into ONE i32, sort
    the single key array (half the bytes of ``sort_key_val`` with an f32
    payload), then run the segmented sum in exact int32 arithmetic. Same
    contract as :func:`_aggregate_topk`; scores carry ≤ T·cmax/2^(qbits+1)
    absolute quantization error (see :func:`bm25_topk_packed` docstring).

    ``scale``, when given, must upper-bound every contribution divided by
    ``levels`` — callers derive it from corpus-global per-term statistics
    so the quantization grid is DETERMINISTIC (independent of which
    shard's postings were gathered): identical contributions quantize to
    identical levels on every shard, making sharded and single-device
    packed scores bit-equal. Defaults to the per-query gathered max."""
    levels = (1 << qbits) - 1
    q = docs.shape[0]

    if scale is None:
        cmax = jnp.max(contrib, axis=1, keepdims=True)  # ≥ 0 by caller clamp
        scale = jnp.maximum(cmax, 1e-30) / levels
    # FLOOR at level 1 for any real (> 0) contribution: a tiny
    # common-term contribution under scale/2 would otherwise quantize to
    # 0, total to 0, and be masked as a no-match by the `good = vals > 0`
    # contract — silently dropping every common-term-only candidate of a
    # query that also has one dominant rare term (review finding). The
    # inflation error for such slots is < scale ≈ cbound/2047, which
    # only reorders docs that were within quantization noise anyway.
    lev = jnp.where(
        contrib > 0,
        jnp.clip(jnp.round(contrib / scale), 1, levels),
        0,
    ).astype(jnp.int32)
    key = docs * (levels + 1) + lev
    key_s = jax.lax.sort(key, dimension=1, is_stable=False)
    doc_s = key_s >> qbits
    lev_s = key_s & levels

    cs = jnp.cumsum(lev_s, axis=1)  # exact: ≤ M · levels < 2^31
    excl = cs - lev_s
    prev = jnp.concatenate(
        [jnp.full((q, 1), -1, doc_s.dtype), doc_s[:, :-1]], axis=1
    )
    nxt = jnp.concatenate(
        [doc_s[:, 1:], jnp.full((q, 1), jnp.iinfo(jnp.int32).max, doc_s.dtype)],
        axis=1,
    )
    is_start = doc_s != prev
    is_end = doc_s != nxt
    base = jax.lax.cummax(jnp.where(is_start, excl, -1), axis=1)
    totals = cs - base  # per-doc int totals ≤ T·levels: f32-exact below
    valid = is_end & (doc_s < n_docs)
    slot_scores = jnp.where(valid, totals, -1).astype(jnp.float32)

    from .topk import blocked_topk

    k_eff = min(k, slot_scores.shape[1])
    vals, pos = blocked_topk(slot_scores, k_eff, block=1024)
    ids = jnp.take_along_axis(doc_s, pos, axis=1)
    good = vals > 0
    return jnp.where(good, vals * scale, 0.0), jnp.where(good, ids, 0)


def _aggregate_topk(docs: jax.Array, contrib: jax.Array, k: int, n_docs: int):
    """Shared candidate aggregation: sort by doc id, exact segmented sum
    (cumsum − cummax base; valid because contributions ≥ 0), blocked
    top-k. Same contract as bm25_topk_sorted's tail."""
    q = docs.shape[0]
    docs_s, contrib_s = jax.lax.sort_key_val(docs, contrib, dimension=1)
    cs = jnp.cumsum(contrib_s, axis=1)
    excl = cs - contrib_s
    prev = jnp.concatenate(
        [jnp.full((q, 1), -1, docs_s.dtype), docs_s[:, :-1]], axis=1
    )
    nxt = jnp.concatenate(
        [docs_s[:, 1:], jnp.full((q, 1), jnp.iinfo(jnp.int32).max, docs_s.dtype)],
        axis=1,
    )
    is_start = docs_s != prev
    is_end = docs_s != nxt
    base = jax.lax.cummax(jnp.where(is_start, excl, -1.0), axis=1)
    totals = cs - base
    valid = is_end & (docs_s < n_docs)
    slot_scores = jnp.where(valid, totals, -jnp.inf)
    from .topk import blocked_topk

    k_eff = min(k, slot_scores.shape[1])
    vals, pos = blocked_topk(slot_scores, k_eff, block=1024)
    ids = jnp.take_along_axis(docs_s, pos, axis=1)
    finite = jnp.isfinite(vals)
    return jnp.where(finite, vals, 0.0), jnp.where(finite, ids, 0)


def _gather_rows(
    qterms, qtf, term_row, term_hot, hot_docs, hot_w, cold_docs, cold_w,
    idf, n_docs, hot_cap=None,
):
    """Two-tier row gather shared by the rows kernels: returns flat
    ``(docs [Q, M], contrib [Q, M])`` with contributions clamped ≥ 0 and
    padding slots set to the ``n_docs`` sentinel.

    ``hot_cap`` (static) activates HOT-FIRST PACKING: the caller
    guarantees each query's terms are ordered hot-tier-first and that no
    query has more than ``hot_cap`` hot terms — then the wide
    (``p_max``) gather only covers the first ``hot_cap`` term slots and
    the candidate width shrinks from ``T·(p_max+cold)`` to
    ``hot_cap·p_max + T·cold`` (the downstream sort is the dominant
    stage cost). Cold terms may sit anywhere (the narrow gather covers
    all T slots). Callers that cannot guarantee the bound use the full
    kernel (BM25Index.topk checks per batch and falls back)."""
    q, t = qterms.shape
    p_max = hot_docs.shape[1]
    cold_width = cold_docs.shape[1]
    t_safe = jnp.maximum(qterms, 0)
    row = term_row[t_safe]  # [Q, T]
    is_hot = term_hot[t_safe] & (qterms >= 0)
    is_cold = ~term_hot[t_safe] & (qterms >= 0)
    scale = (idf[t_safe] * qtf)[:, :, None]  # [Q, T, 1]

    th = t if hot_cap is None else min(hot_cap, t)
    is_hot_c = is_hot[:, :th]
    row_h = row[:, :th]
    scale_h = scale[:, :th]
    hd = jnp.take(hot_docs, jnp.where(is_hot_c, row_h, 0).reshape(-1), axis=0)
    hw = jnp.take(hot_w, jnp.where(is_hot_c, row_h, 0).reshape(-1), axis=0)
    hd = hd.reshape(q, th, p_max)
    hw = hw.reshape(q, th, p_max)
    h_contrib = jnp.maximum(
        jnp.where(is_hot_c[:, :, None], hw * scale_h, 0.0), 0.0
    )
    hd = jnp.where(is_hot_c[:, :, None], hd, n_docs)

    cd = jnp.take(cold_docs, jnp.where(is_cold, row, 0).reshape(-1), axis=0)
    cw = jnp.take(cold_w, jnp.where(is_cold, row, 0).reshape(-1), axis=0)
    cd = cd.reshape(q, t, cold_width)
    cw = cw.reshape(q, t, cold_width)
    c_contrib = jnp.maximum(
        jnp.where(is_cold[:, :, None], cw * scale, 0.0), 0.0
    )
    cd = jnp.where(is_cold[:, :, None], cd, n_docs)

    docs = jnp.concatenate(
        [hd.reshape(q, -1), cd.reshape(q, -1)], axis=1
    )
    contrib = jnp.concatenate(
        [h_contrib.reshape(q, -1), c_contrib.reshape(q, -1)], axis=1
    )
    return docs, contrib


@functools.partial(jax.jit, static_argnames=("k", "n_docs"))
def bm25_topk_rows(
    qterms: jax.Array,  # [Q, T] i32, -1 padding
    qtf: jax.Array,  # [Q, T] f32
    term_row: jax.Array,  # [V] i32
    term_hot: jax.Array,  # [V] bool
    hot_docs: jax.Array,  # [H, p_max]
    hot_w: jax.Array,
    cold_docs: jax.Array,  # [C, cold_width]
    cold_w: jax.Array,
    idf: jax.Array,  # [V] f32
    k: int,
    *,
    n_docs: int,
) -> tuple[jax.Array, jax.Array]:
    """Row-layout BM25 top-k: two aligned row gathers (hot/cold tier),
    mask by tier membership, aggregate. Exact (identical contributions
    to the 1-D kernels up to f32 sum order)."""
    docs, contrib = _gather_rows(
        qterms, qtf, term_row, term_hot, hot_docs, hot_w,
        cold_docs, cold_w, idf, n_docs,
    )
    return _aggregate_topk(docs, contrib, k, n_docs)


def _rescore_candidates_exact(
    docs: jax.Array,  # [Q, M] i32 gathered posting doc ids
    contrib: jax.Array,  # [Q, M] f32 gathered contributions (0 in padding)
    vals: jax.Array,  # [Q, K] packed-quantized totals (0 = no match)
    ids: jax.Array,  # [Q, K] candidate doc ids
) -> tuple[jax.Array, jax.Array]:
    """Exact f32 rescore of the packed kernel's candidate pool: each
    candidate's true score is one masked reduction over the gathered
    postings (a doc matches ≤ 1 slot per query term, so zeros dominate
    and the reduce is exact). Selection stays on the quantized totals —
    only boundary-of-k membership keeps quantization error; scores and
    within-pool order become exact. Cost ≈ Q·K·M compare+select+add on
    the VPU, blocked over K to bound the [Q, kb, M] transient."""
    k_eff = ids.shape[1]
    kb = 16
    outs = []
    for j0 in range(0, k_eff, kb):
        cand = ids[:, j0 : j0 + kb]
        match = docs[:, None, :] == cand[:, :, None]
        outs.append(
            jnp.sum(jnp.where(match, contrib[:, None, :], 0.0), axis=-1)
        )
    exact = jnp.concatenate(outs, axis=1)
    exact = jnp.where(vals > 0.0, exact, 0.0)  # keep no-match sentinel
    vals2, pos = jax.lax.top_k(exact, k_eff)  # restore exact-score order
    return vals2, jnp.take_along_axis(ids, pos, axis=1)


@functools.partial(
    jax.jit, static_argnames=("k", "n_docs", "qbits", "hot_cap", "rescore")
)
def bm25_topk_rows_packed(
    qterms: jax.Array,  # [Q, T] i32, -1 padding
    qtf: jax.Array,  # [Q, T] f32
    term_row: jax.Array,  # [V] i32
    term_hot: jax.Array,  # [V] bool
    hot_docs: jax.Array,  # [H, p_max]
    hot_w: jax.Array,
    cold_docs: jax.Array,  # [C, cold_width]
    cold_w: jax.Array,
    idf: jax.Array,  # [V] f32
    k: int,
    *,
    n_docs: int,
    qbits: int = 11,
    term_wmax: jax.Array | None = None,  # [V] f32 global max posting weight
    hot_cap: int | None = None,  # see _gather_rows hot-first packing
    rescore: bool = True,  # exact f32 rescore of the candidate pool
) -> tuple[jax.Array, jax.Array]:
    """Row-layout gather + packed single-key aggregation — the fastest
    TPU path: the 3.6×-faster aligned row gather of
    :func:`bm25_topk_rows` feeding the half-the-sort-bytes packed
    reduction of :func:`bm25_topk_packed` (the dominant stage cost is
    the [Q, M] sort; a single i32 key array moves half the bytes of an
    (i32 key, f32 payload) pair and the segmented sum becomes exact
    int32 work). Same ``n_docs < 2^(31-qbits)`` bound and ≤ cmax/2^(qbits+1)
    per-contribution quantization error as the packed kernel; callers
    above the bound fall back to :func:`bm25_topk_rows`.

    ``term_wmax`` (per-term corpus-global max posting weight — free from
    impact ordering: the first posting of each term is its max) makes the
    quantization grid shard-independent: the scale becomes
    ``max_t q_tf·idf_t·wmax_t / levels``, a bound on every contribution
    that depends only on the query and corpus-global statistics, so a
    sharded engine quantizing its local postings produces bit-identical
    totals to the single-device kernel. Without it the scale is the
    per-query gathered max (tighter by ~2× but layout-dependent)."""
    if n_docs >= 1 << (31 - qbits):
        raise ValueError(
            f"n_docs={n_docs} overflows packed keys with qbits={qbits}"
        )
    docs, contrib = _gather_rows(
        qterms, qtf, term_row, term_hot, hot_docs, hot_w,
        cold_docs, cold_w, idf, n_docs, hot_cap,
    )
    scale = None
    if term_wmax is not None:
        valid = qterms >= 0
        t_safe = jnp.maximum(qterms, 0)
        cbound = jnp.max(
            jnp.where(valid, qtf * idf[t_safe] * term_wmax[t_safe], 0.0),
            axis=1, keepdims=True,
        )
        scale = jnp.maximum(cbound, 1e-30) / ((1 << qbits) - 1)
    vals, ids = _aggregate_topk_packed(docs, contrib, k, n_docs, qbits, scale)
    if rescore:
        # measured at 1M/p_max 512: quantized-total ordering alone holds
        # recall@10-vs-exact at 0.952; the exact pool rescore restores
        # the unquantized kernel's 0.994 (pruning-limited) for ~0.5 ms.
        # NB: f32 sum order here follows gather-slot order, which is
        # layout-dependent — sharded callers that need bit-equality with
        # the single-device kernel pass rescore=False (the quantized
        # totals ARE shard-independent; the docstring's grid argument).
        vals, ids = _rescore_candidates_exact(docs, contrib, vals, ids)
    return vals, ids


@functools.partial(jax.jit, static_argnames=("k", "n_docs", "p_max", "qbits"))
def bm25_topk_packed(
    qterms: jax.Array,  # [Q, T] i32, -1 padding
    qtf: jax.Array,  # [Q, T] f32
    term_start: jax.Array,
    term_len: jax.Array,
    post_docs: jax.Array,
    post_w: jax.Array,
    idf: jax.Array,
    k: int,
    *,
    n_docs: int,
    p_max: int,
    qbits: int = 11,
) -> tuple[jax.Array, jax.Array]:
    """Packed-key BM25 top-k: quantize each contribution to ``qbits`` and
    pack ``doc_id << qbits | level`` into ONE i32, so the dominant sort
    moves half the bytes of ``sort_key_val`` (i32 keys only, no f32
    payload), and the segmented sum runs in exact int32 arithmetic (no
    long-f32-cumsum noise). Requires ``n_docs < 2^(31 - qbits)`` — 1M docs
    at the default 11 bits; callers above that fall back to
    :func:`bm25_topk_sorted` (sharded deployments stay far below it).

    Quantization error: ≤ cmax/2^(qbits+1) per contribution (cmax = the
    query's max single contribution), so a doc matching j terms carries
    ≤ j·cmax/4096 absolute error — ~1e-3 relative on realistic scores,
    below BM25's own modeling noise; top-10 overlap vs the exact kernel
    measured ≥0.999 at the 1M benchmark operating point.
    """
    if n_docs >= 1 << (31 - qbits):
        raise ValueError(
            f"n_docs={n_docs} overflows packed keys with qbits={qbits}"
        )

    def gather_one(terms_row, qtf_row):
        def per_term(term, q_tf):
            valid = term >= 0
            t_safe = jnp.maximum(term, 0)
            start = term_start[t_safe]
            length = jnp.minimum(term_len[t_safe], p_max)
            docs = jax.lax.dynamic_slice(post_docs, (start,), (p_max,))
            w = jax.lax.dynamic_slice(post_w, (start,), (p_max,))
            pos = jax.lax.broadcasted_iota(jnp.int32, (p_max, 1), 0)[:, 0]
            mask = (pos < length) & valid
            contrib = jnp.maximum(
                jnp.where(mask, w * idf[t_safe] * q_tf, 0.0), 0.0
            )
            docs = jnp.where(mask, docs, n_docs)  # sentinel sorts last
            return docs, contrib

        docs, contrib = jax.vmap(per_term)(terms_row, qtf_row)
        return docs.reshape(-1), contrib.reshape(-1)

    docs, contrib = jax.vmap(gather_one)(qterms, qtf)  # [Q, M]
    return _aggregate_topk_packed(docs, contrib, k, n_docs, qbits)


def bm25_score_upper_bound(qtf: jax.Array, qterms: jax.Array, idf: jax.Array,
                           k1: float) -> jax.Array:
    """Per-query upper bound Σ q_tf · idf · (k1+1) — used to normalize
    sparse scores into [0,1] for weighted fusion without a data-dependent
    max pass."""
    valid = qterms >= 0
    t_safe = jnp.maximum(qterms, 0)
    return jnp.sum(jnp.where(valid, qtf * idf[t_safe] * (k1 + 1.0), 0.0), axis=-1)
