"""CTC beam search with character-bigram LM rescoring.

Round-2 verdict (item 5 / weak #3): greedy CTC output is fuzzy-correct
but flips near-homoglyphs (I/l, O/0, rn/m) that pixels alone cannot
separate at 32-px height; a language prior converts fuzzy into exact.
The prior here is a character bigram model estimated from the SAME text
distribution the engine serves (``synth.wordlike_text``: pseudo-words,
prices, dates, codes — the statistics of document lines), built
deterministically at startup (no artifact changes; the reference's CTC
world, ch_ppocr_rec/utils.py:13-90, has no LM pass at all).

Decoder: standard CTC prefix beam search (Hannun et al.) over the
per-timestep top-C classes, scoring each character extension with
``alpha · log P(c | prev)``. Cost: O(T · beam · C) python ops per line —
a few ms at T≈80, beam 8, C 6.
"""

from __future__ import annotations

import functools
import math
from collections import defaultdict

import numpy as np

from .wordlist import is_common_word

_NEG = -1e30


@functools.lru_cache(maxsize=8)
def bigram_lm(charset: str, *, samples: int = 30_000, seed: int = 7,
              add_k: float = 0.5) -> np.ndarray:
    """[V+1, V+1] log P(next | prev) with row V = line start. Built from
    the same mix recognizer training samples (60% wordlike pseudo-word
    statistics, 40% business-English lexicon lines) so the decode prior
    matches the serving distribution; cached per charset."""
    from .synth import business_text, wordlike_text

    rng = np.random.default_rng(seed)
    v = len(charset)
    pos = {c: i for i, c in enumerate(charset)}
    counts = np.full((v + 1, v + 1), add_k, np.float64)
    for _ in range(samples):
        text = (
            business_text(rng, charset, 26)
            if rng.random() < 0.4
            else wordlike_text(rng, charset, max_len=14)
        )
        prev = v
        for ch in text:
            i = pos.get(ch)
            if i is None:
                prev = v
                continue
            counts[prev, i] += 1.0
            prev = i
    lm = np.log(counts / counts.sum(axis=1, keepdims=True))
    return lm.astype(np.float32)


def _logsumexp2(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    if b <= _NEG / 2:
        return a
    return a + math.log1p(math.exp(b - a))


def ctc_beam_decode(
    logits: np.ndarray,  # [B, T, V+1], blank id = V
    charset: str,
    *,
    beam: int = 8,
    top_c: int = 6,
    alpha: float = 0.5,
    beta: float = 1.2,
    lm: np.ndarray | None = None,
) -> list[tuple[str, float]]:
    """LM-rescored CTC decode; same return contract as
    ``ctc_greedy_decode``: [(text, mean char prob)] per item.

    ``beta`` is the standard per-character insertion bonus: the LM term
    ``alpha * log P`` is ≤ 0 on every non-blank extension while blank
    transitions pay nothing, so without a compensating bonus the beam
    systematically prefers DELETIONS ('with'→'ith', '$226.63'→'$22663'
    — both measured). beta ≈ alpha * E[-log P_lm] keeps length
    decisions with the acoustic model while the LM picks between
    near-homoglyph alternatives."""
    blank = len(charset)
    if lm is None:
        lm = bigram_lm(charset)
    x = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(x)
    probs /= probs.sum(axis=-1, keepdims=True)
    logp = np.log(np.maximum(probs, 1e-12))
    out: list[tuple[str, float]] = []
    for b in range(logits.shape[0]):
        # beams: prefix tuple -> [p_blank, p_nonblank] (log)
        beams: dict[tuple[int, ...], list[float]] = {(): [0.0, _NEG]}
        top_idx = np.argsort(-logp[b], axis=-1)[:, : top_c + 1]
        for t in range(logits.shape[1]):
            nxt: dict[tuple[int, ...], list[float]] = defaultdict(
                lambda: [_NEG, _NEG]
            )
            cand = top_idx[t]
            for prefix, (pb, pnb) in beams.items():
                total = _logsumexp2(pb, pnb)
                last = prefix[-1] if prefix else -1
                for c in cand:
                    c = int(c)
                    lp = float(logp[b, t, c])
                    if c == blank:
                        e = nxt[prefix]
                        e[0] = _logsumexp2(e[0], total + lp)
                        continue
                    prev_for_lm = last if last >= 0 else blank
                    lm_term = alpha * float(lm[prev_for_lm, c]) + beta
                    if c == last:
                        # repeat char: extends only from p_blank
                        e = nxt[prefix]
                        e[1] = _logsumexp2(e[1], pnb + lp)
                        e2 = nxt[prefix + (c,)]
                        e2[1] = _logsumexp2(e2[1], pb + lp + lm_term)
                    else:
                        e2 = nxt[prefix + (c,)]
                        e2[1] = _logsumexp2(e2[1], total + lp + lm_term)
            beams = dict(
                sorted(
                    nxt.items(),
                    key=lambda kv: -_logsumexp2(kv[1][0], kv[1][1]),
                )[:beam]
            )
        best, _ = max(
            beams.items(), key=lambda kv: _logsumexp2(kv[1][0], kv[1][1])
        )
        text = "".join(charset[i] for i in best)
        # confidence from the greedy frame probabilities of the chosen chars
        conf = float(np.exp(np.mean([
            logp[b, t].max() for t in range(logits.shape[1])
        ]))) if text else 0.0
        out.append((text, conf))
    return out


# ---------------- lexicon correction ----------------
# Round-3 invoice-eval error catalog: the residual exact-match misses are
# dominated by single-character CTC deletions in common business words
# ('Toal'→Total, 'Noes'→Notes, 'Dae'→Date, 'bsiness'→business) and
# missing inter-word spaces ('foryour'). Beam+LM rescoring cannot recover
# a character NO beam contains; a word-level correction against the
# serving lexicon can — the standard lexicon-constrained decoding step of
# production CTC stacks, applied conservatively (alphabetic tokens only,
# unique edit-distance-1 repair or unique two-word split, case preserved).


@functools.lru_cache(maxsize=1)
def _lexicon() -> dict[str, set[str]]:
    """Lowercased serving lexicon, bucketed by length for fast dist-1
    candidate scans (the same words the LM/trainer mix uses)."""
    from .synth import BUSINESS_LABELS, BUSINESS_WORDS, _MONTHS

    words: set[str] = set()
    for label in BUSINESS_LABELS:
        for w in label.split():
            words.add(w.lower())
    words.update(w.lower() for w in BUSINESS_WORDS)
    words.update(m.lower() for m in _MONTHS)
    by_len: dict[int, set[str]] = {}
    for w in words:
        by_len.setdefault(len(w), set()).add(w)
    return {"all": words, **{str(k): v for k, v in by_len.items()}}


# Visual confusion pairs at ≈150-dpi raster height, measured from the
# round-4 invoice-eval misses ('Librarv'→Library, 'Arount'→Amount,
# 'ShioTo'→Ship To) — the classic low-resolution CTC substitutions
# (v/y descender loss, o/p bowl-only, r = left stem of m). Substitution
# repair is restricted to these pairs so correctly-spelled
# out-of-lexicon words ('Dale', 'Dole') can never be rewritten: their
# mismatches are not visually confusable, only truly misread glyphs are.
_CONFUSION_PAIRS = frozenset(
    {("v", "y"), ("y", "v"), ("o", "p"), ("p", "o"), ("r", "m"), ("m", "r"),
     ("i", "l"), ("l", "i")}  # I/l/i stem confusion ('BilITo' → Bill To)
)


@functools.lru_cache(maxsize=1)
def _canon_lexicon() -> tuple[dict[str, str], dict[int, dict[str, str]]]:
    """Lexicon keyed by CANONICAL form (homoglyph-folded then lowered —
    the recognizer's own equivalence classes, synth.canonicalize_text),
    so 'BilI' matches 'bill' exactly: the model cannot express the I/l
    distinction, and repairs must not punish it for that."""
    from .synth import canonicalize_text

    by_canon: dict[str, str] = {}
    by_len: dict[int, dict[str, str]] = {}
    for w in sorted(_lexicon()["all"]):
        c = canonicalize_text(w).lower()
        by_canon.setdefault(c, w)
        by_len.setdefault(len(c), {}).setdefault(c, w)
    return by_canon, by_len


def _canon(s: str) -> str:
    from .synth import canonicalize_text

    return canonicalize_text(s).lower()


def _confusion_candidates(token_c: str, by_len: dict) -> list[str]:
    """Same-length lexicon words whose every mismatch with ``token_c``
    is a visual confusion pair (≤2 mismatches) — canon space."""
    out = set()
    for w_c, w in by_len.get(len(token_c), {}).items():
        mism = [(a, b) for a, b in zip(token_c, w_c) if a != b]
        if 1 <= len(mism) <= 2 and all(p in _CONFUSION_PAIRS for p in mism):
            out.add(w)
    return sorted(out)


def _del2_candidates(token_c: str, by_len: dict) -> list[str]:
    """Lexicon words that become ``token_c`` after TWO character
    deletions ('Sandad'→Standard, 'Quanty'→Quantity) — the measured CTC
    failure mode compounded; gated to len ≥ 6 at the call site."""
    out = set()
    for w_c, w in by_len.get(len(token_c) + 2, {}).items():
        it = iter(w_c)
        if all(ch in it for ch in token_c):  # subsequence test
            out.add(w)
    return sorted(out)


def _resolve_part(part_c: str, by_canon: dict, by_len: dict):
    """Resolve one segmentation part to a lexicon word: exact canonical
    hit → (word, repaired=False); else, for parts ≥ 3 chars, the UNIQUE
    deletion-1 or confusion-pair repair → (word, repaired=True); else
    None."""
    w = by_canon.get(part_c)
    if w is not None:
        return w, False
    if len(part_c) < 3:
        return None
    cands = set()
    for w_c, lw in by_len.get(len(part_c) + 1, {}).items():
        it = iter(w_c)
        if all(ch in it for ch in part_c):
            cands.add(lw)
    cands.update(_confusion_candidates(part_c, by_len))
    if len(cands) == 1:
        return next(iter(cands)), True
    return None


def _segment_repair(core: str) -> list[tuple[str, str]] | None:
    """Split a missing-spaces compound into 2–3 lexicon words, allowing
    at most ONE part to need a (unique) deletion-1/confusion repair:
    'foryourbsiness' → for your business, 'BilITo' → Bill To. Matching
    runs in canon space; the returned parts pair each resolved lexicon
    word with the raw source slice (for case restoration). Returns None
    unless exactly one distinct resolution exists."""
    by_canon, by_len = _canon_lexicon()
    c = _canon(core)
    n = len(c)
    if n != len(core):  # canonicalization must stay 1:1 with raw chars
        return None
    results: dict[tuple[str, ...], list[tuple[str, str]]] = {}

    def walk(pos: int, parts: list, repaired: bool, depth: int):
        if pos == n:
            if len(parts) >= 2:
                results.setdefault(
                    tuple(w for w, _ in parts), list(parts)
                )
            return
        if depth == 3:
            return
        for end in range(pos + 2, n + 1):
            if n - end == 1:  # would strand a 1-char remainder
                continue
            r = _resolve_part(c[pos:end], by_canon, by_len)
            if r is None:
                continue
            w, rep = r
            if rep and repaired:
                continue
            walk(end, parts + [(w, core[pos:end])], repaired or rep,
                 depth + 1)

    walk(0, [], False, 0)
    if len(results) != 1:
        return None
    return next(iter(results.values()))


def _edit1_candidates(token: str, lex: dict) -> list[str]:
    """Lexicon words at edit distance 1 from ``token``, with the
    DELETION class ('token = lexicon word missing one char') returned
    alone when non-empty: deletion is the measured CTC failure mode
    (rescore beta docstring), so 'dae' repairs to 'date' (insert t)
    rather than staying ambiguous against substitution candidate
    'due'."""
    t = token
    n = len(t)
    dels = set()
    # ONLY the deletion class ('token = lexicon word missing one char'):
    # deletion is the measured CTC failure mode (rescore beta
    # docstring), and an UNRESTRICTED substitution/spurious-char class
    # rewrites correctly-spelled out-of-lexicon words — 'Dale'→'Date',
    # 'Model'→'Mode' (review finding). Substitution repair exists but
    # only over the visual-confusion pairs (_confusion_candidates),
    # which cannot produce those rewrites.
    for w in lex.get(str(n + 1), ()):  # token missing one char of w
        i = 0
        while i < n and w[i] == t[i]:
            i += 1
        if w[:i] + w[i + 1:] == t:
            dels.add(w)
    return sorted(dels)


@functools.lru_cache(maxsize=1)
def _label_words() -> frozenset:
    """Colon-bearing label words: the last word of every form label
    (``synth.BUSINESS_LABELS`` — the word the ':' attaches to)."""
    from .synth import BUSINESS_LABELS

    return frozenset(label.split()[-1].lower() for label in BUSINESS_LABELS)


def _label_colon_repair(core_c: str) -> str | None:
    """First-char-anchored deletion repair against the label vocabulary
    — for tokens the layout marks as FORM LABELS (trailing ':').

    Round-5 invoice miss catalog: 'Terms:' reads as 'Tes:' (the 'rm'
    pair smears away at ~150 dpi). General del2 is gated to len ≥ 6
    because short-token two-deletion repair is wildly ambiguous over the
    full lexicon; against the ~40 label words, WITH the first character
    anchored (CTC essentially never deletes the strong onset glyph of a
    crop), 'tes' → 'terms' is unique — 'notes' also contains the
    subsequence but fails the anchor. Unique-candidate gate as usual."""
    if len(core_c) < 3:
        return None
    cands = set()
    for w in _label_words():
        w_c = _canon(w)
        if not w_c or w_c[0] != core_c[0]:
            continue
        if len(w_c) - len(core_c) in (1, 2):
            it = iter(w_c)
            if all(ch in it for ch in core_c):
                cands.add(w)
    if len(cands) == 1:
        return next(iter(cands))
    return None


def _match_case(src: str, word: str) -> str:
    if src.isupper():
        return word.upper()
    if src[:1].isupper():
        return word[0].upper() + word[1:]
    return word


def lexicon_correct(text: str) -> str:
    """Conservative word-level repair: for each alphabetic token (len ≥ 3)
    not in the serving lexicon, apply in order the first UNIQUE repair
    among (1) edit-distance-1 deletion (:func:`_edit1_candidates`),
    (2) visual-confusion-pair substitution (:func:`_confusion_candidates`
    — 'Arount'→Amount, 'Librarv'→Library), (3) double-deletion for
    tokens ≥ 6 chars (:func:`_del2_candidates` — 'Sandad'→Standard),
    (4) 2–3-word compound segmentation with at most one repaired part
    (:func:`_segment_repair` — 'foryourbsiness'→'for your business',
    'BilITo'→'Bill To'). Tokens with digits, short tokens, in-lexicon
    tokens, and ambiguous repairs pass through untouched — proper nouns
    and codes must never be 'corrected'."""
    # typography repairs the recognizer systematically misses (spaces
    # adjacent to punctuation were absent from the round-3 training
    # distribution; synth.wordlike_text now covers them for future
    # retrains): ','+letter → ', ' (digit grouping '3,122.43' untouched)
    # and letter+'('+digit → ' (' ('Discount(20%)').
    fixed_chars = []
    for i, ch in enumerate(text):
        fixed_chars.append(ch)
        if (
            ch == ","
            and i + 1 < len(text)
            and text[i + 1].isalpha()
        ):
            fixed_chars.append(" ")
        if (
            ch.isalpha()
            and i + 2 < len(text)
            and text[i + 1] == "("
            and text[i + 2].isdigit()
        ):
            fixed_chars.append(" ")
        # '#'+digit → '# '+digit: the number-sign label renders with a
        # thin space ('# 4820') the recognizer collapses at 150 dpi —
        # same class as the ','+letter repair above. Gated to
        # token-INITIAL '#' only (preceded by whitespace or line start):
        # an embedded '#' is reference-code typography ('PO#12',
        # 'ABC#77') that must never be split (round-4 advisor finding).
        if (
            ch == "#"
            and i + 1 < len(text)
            and text[i + 1].isdigit()
            and (i == 0 or text[i - 1].isspace())
        ):
            fixed_chars.append(" ")
    text = "".join(fixed_chars)

    lex = _lexicon()
    words = lex["all"]
    out_tokens = []
    for raw in text.split(" "):
        # split off punctuation margins; only the alphabetic core is fair game
        start = 0
        end = len(raw)
        while start < end and not raw[start].isalpha():
            start += 1
        while end > start and not raw[end - 1].isalpha():
            end -= 1
        core = raw[start:end]
        # orthographic l→I: in an otherwise-UPPERCASE pure-alphabetic
        # token a lowercase 'l' is the I/l glyph confusion ('INVOlCE'),
        # not a real l — classic OCR normalization, safe because no
        # English word is spelled all-caps-except-l. The isalpha() gate
        # keeps serials/codes ('SN4l7X') untouched (review finding).
        if (
            len(core) >= 3
            and "l" in core
            and core.isalpha()
            and all(c.isupper() for c in core if c != "l")
            and sum(c.isupper() for c in core) >= 2
        ):
            core = core.replace("l", "I")
            raw = raw[:start] + core + raw[end:]
        if (
            len(core) < 3
            or not core.isalpha()
            or core.lower() in words
            # common-English gate (round-4 advisor finding): a
            # correctly-spelled real word outside the small serving
            # lexicon ('mate', 'rode', 'deliver') must never be
            # rewritten, even when a UNIQUE lexicon neighbour exists —
            # uniqueness bounds ambiguity, not reality. Applies to
            # every rewrite class below (edit1 deletion, confusion
            # pair, double deletion, segmentation).
            or is_common_word(core.lower())
        ):
            out_tokens.append(raw)
            continue
        cands = _edit1_candidates(core.lower(), lex)
        if len(cands) == 1:
            fixed = _match_case(core, cands[0])
            out_tokens.append(raw[:start] + fixed + raw[end:])
            continue
        if len(cands) == 0:
            by_canon, by_len = _canon_lexicon()
            core_c = _canon(core)
            if len(core_c) == len(core):
                conf = _confusion_candidates(core_c, by_len)
                if len(conf) == 1:
                    fixed = _match_case(core, conf[0])
                    out_tokens.append(raw[:start] + fixed + raw[end:])
                    continue
                if not conf and len(core) >= 6:
                    d2 = _del2_candidates(core_c, by_len)
                    if len(d2) == 1:
                        fixed = _match_case(core, d2[0])
                        out_tokens.append(raw[:start] + fixed + raw[end:])
                        continue
            if len(core) >= 5:
                parts = _segment_repair(core)
                if parts is not None:
                    fixed = " ".join(
                        _match_case(src, w) for w, src in parts
                    )
                    out_tokens.append(raw[:start] + fixed + raw[end:])
                    continue
        # form-label deletion repair, anchored on the first glyph: only
        # for tokens the layout marks as labels (trailing ':')
        if raw[end : end + 1] == ":":
            core_c = _canon(core)
            if len(core_c) == len(core):
                lab = _label_colon_repair(core_c)
                if lab is not None:
                    out_tokens.append(
                        raw[:start] + _match_case(core, lab) + raw[end:]
                    )
                    continue
        out_tokens.append(raw)
    # second pass — colon glyph restoration: at ~150 dpi the ':' dots
    # smear into '!'-class marks; after a colon-bearing form-label word
    # an exclamation is never the right reading. Runs AFTER the word
    # repairs so a repaired label keeps benefiting ('Noes!.' →(edit1)
    # 'Notes!.' →(here) 'Notes:'); prose ('Thanks for your business!')
    # is untouched because 'business' is not a label word.
    labels = _label_words()
    restored = []
    for raw in out_tokens:
        end = len(raw)
        start = 0
        while start < end and not raw[start].isalpha():
            start += 1
        while end > start and not raw[end - 1].isalpha():
            end -= 1
        core = raw[start:end]
        tail = raw[end:]
        if (
            core
            and core.lower() in labels
            and "!" in tail
            and len(tail) == 2
        ):
            # only GARBLED tails ('!.', '!,'): a clean single '!' is a
            # plausible prose exclamation ('Great rate!', 'ship to!')
            # and several label words are common prose words — round-5
            # review caught the single-'!' variant rewriting correct
            # text, the class the common-English gate exists to stop
            raw = raw[:start] + core + ":"
        restored.append(raw)
    return " ".join(restored)
