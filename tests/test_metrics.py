"""Metric implementations: known-value and property tests.

(The evaluate/jiwer libraries are unavailable offline, so values are checked
against hand-computed cases.)"""

import numpy as np
import pytest

from aat_tpu.training import metrics as M


def test_wer_known_values():
    assert M.wer(["a b c"], ["a b c"]) == 0.0
    # one substitution out of 3 reference words
    assert abs(M.wer(["a x c"], ["a b c"]) - 1 / 3) < 1e-9
    # corpus pooling: (1 + 0) errors / (3 + 2) words
    assert abs(M.wer(["a x c", "d e"], ["a b c", "d e"]) - 1 / 5) < 1e-9
    # insertion + deletion
    assert abs(M.wer(["a b c d"], ["a b c"]) - 1 / 3) < 1e-9


def test_bleu_perfect_and_zero():
    assert abs(M.bleu(["the cat sat on the mat"], [["the cat sat on the mat"]]) - 1.0) < 1e-9
    assert M.bleu(["x y"], [["a b c"]]) == 0.0


def test_bleu_brevity_penalty():
    # shortened prediction with perfect n-gram precision gets penalized
    full = M.bleu(["a b c d e f g h"], [["a b c d e f g h"]])
    short = M.bleu(["a b c d e f"], [["a b c d e f g h"]])
    assert short < full


def test_rouge_known():
    r = M.rouge(["the cat sat"], ["the cat sat"])
    assert r["rouge1"] == r["rouge2"] == r["rougeL"] == r["rougeLsum"] == 1.0
    r = M.rouge(["the cat"], ["the dog"])
    assert abs(r["rouge1"] - 0.5) < 1e-9
    assert r["rouge2"] == 0.0


def test_meteor_perfect_close_to_one():
    s = M.meteor(["the cat sat on the mat"], ["the cat sat on the mat"])
    # single chunk: penalty = 0.5*(1/6)^3 → score ≈ 0.9977
    assert 0.99 < s <= 1.0
    assert M.meteor(["x"], ["y"]) == 0.0


def test_normalization_pipeline():
    assert M.normalize_text(" Hello\nWorld  ") == "hello world"
    assert M.strip_prefix("PREFIX rest of text", "PREFIX ") == "rest of text"


class FakeTokenizer:
    """Maps ids to single letters for decode tests."""

    def batch_decode(self, ids, skip_special_tokens=True):
        import numpy as np
        out = []
        for row in np.asarray(ids):
            out.append(" ".join(chr(97 + int(t) % 26) for t in row if int(t) >= 0))
        return out


def test_compute_metrics_facade():
    cm = M.ComputeMetrics(FakeTokenizer())
    generated = np.array([[0, 1, 2, 3, 4]])  # "a b c d e"
    inputs = np.array([[0, 1, 2, 3, 4]])  # reference "a b c d e", no prefix
    prefix = np.array([[-1]])  # decodes to ""
    out = cm(generated_ids=generated, inputs_ids=inputs, prefix_ids=prefix)
    assert out["wer"] == 0.0
    assert out["evaluate_bleu"] > 99.0
    assert out["evaluate_rouge1"] == 1.0


def test_meteor_stem_matching():
    """Porter-stem stage: 'running' aligns with 'run' (the reference's nltk
    meteor stems before giving up on a word)."""
    pytest.importorskip("nltk")
    M._STEM = None  # reset backend cache
    s_exact = M.meteor(["the cat sat"], ["the cat sat"])
    s_stem = M.meteor(["the cats sitting"], ["the cat sits"])
    assert s_stem > 0.9, s_stem  # all three words align via stems
    assert s_exact > s_stem - 1e-9


def test_meteor_matches_nltk_without_wordnet(monkeypatch):
    """Oracle parity vs nltk.translate.meteor_score with the WordNet stage
    neutralized (no corpus data in this env) — exact + stem stages and the
    fmean/fragmentation math must agree to float precision."""
    nltk = pytest.importorskip("nltk")
    import nltk.translate.meteor_score as ms

    class _NoSyn:
        @staticmethod
        def synsets(word):
            return []

    monkeypatch.setattr(M, "_WORDNET", None)

    cases = [
        ("the quick brown fox jumps", "the fast brown foxes jumped high"),
        ("a b c d", "d c b a"),
        ("running dogs barked loudly", "the running dog barks loud"),
        ("completely different words here", "nothing alike at all whatsoever"),
        ("it is a guide to action", "it is a guide to action which ensures"),
    ]
    for hyp, ref in cases:
        ours = M.meteor([hyp], [ref])
        # nltk binds the real wordnet as a default argument — pass the
        # empty stub explicitly so both sides skip the synonym stage
        theirs = ms.meteor_score([ref.split()], hyp.split(), wordnet=_NoSyn())
        assert abs(ours - theirs) < 1e-9, (hyp, ref, ours, theirs)
    M._WORDNET = "unset"
