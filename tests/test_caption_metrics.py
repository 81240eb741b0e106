"""Differential tests: caption metrics vs the vendored pycocoevalcap."""

import random
import sys

import pytest

sys.path.insert(0, "/root/reference/eval")

from hero_tpu.evaluation import caption_metrics as ours


def _rand_corpus(seed, n_items=30, vocab=40):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    gts, res = {}, {}
    for i in range(n_items):
        key = str(i)
        gts[key] = [[rng.choice(words) for _ in range(rng.randint(4, 15))]
                    for _ in range(rng.randint(1, 4))]
        # hypothesis overlaps a reference partially
        base = list(gts[key][0])
        rng.shuffle(base)
        res[key] = base[:rng.randint(3, len(base))]
    return gts, res


def _to_str(d):
    return {k: [" ".join(t) for t in v] if isinstance(v[0], list)
            else [" ".join(v)] for k, v in d.items()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bleu_matches_pycoco(seed):
    from pycocoevalcap.bleu.bleu import Bleu
    gts, res = _rand_corpus(seed)
    want, _ = Bleu(4).compute_score(_to_str(gts), _to_str(res))
    got = ours.bleu(gts, res)
    for a, b in zip(got, want):
        assert a == pytest.approx(b, rel=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rouge_matches_pycoco(seed):
    from pycocoevalcap.rouge.rouge import Rouge
    gts, res = _rand_corpus(seed)
    want, _ = Rouge().compute_score(_to_str(gts), _to_str(res))
    got = ours.rouge_l(gts, res)
    assert got == pytest.approx(want, rel=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cider_matches_pycoco(seed):
    from pycocoevalcap.cider.cider import Cider
    gts, res = _rand_corpus(seed)
    want, _ = Cider().compute_score(_to_str(gts), _to_str(res))
    got = ours.cider_d(gts, res)
    assert got == pytest.approx(want, rel=1e-6)


def test_ptb_tokenize_basic():
    toks = ours.ptb_tokenize("A man, who isn't here, said: \"It's fine.\"")
    assert "a" in toks and "man" in toks
    assert "," not in toks and ":" not in toks
    assert "n't" in toks or "isn't" in toks
