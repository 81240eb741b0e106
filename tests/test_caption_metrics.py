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


# Golden outputs of the Stanford PTBTokenizer (-preserveLines -lowerCase)
# followed by pycocoevalcap's PUNCTUATIONS filter, hand-verified against
# the documented Penn Treebank conventions the jar implements.
PTB_GOLDEN = [
    ('He said, "Don\'t do it."',
     ["he", "said", "do", "n't", "do", "it"]),
    ("A man runs to the U.S. building",          # abbrev period kept
     ["a", "man", "runs", "to", "the", "u.s.", "building"]),
    ("There are 3,000 people",                   # comma inside number kept
     ["there", "are", "3,000", "people"]),
    ("She can't stop laughing",
     ["she", "ca", "n't", "stop", "laughing"]),
    ("You cannot be serious",                    # cannot -> can not
     ["you", "can", "not", "be", "serious"]),
    ("the well-known actor smiles",              # hyphens kept
     ["the", "well-known", "actor", "smiles"]),
    ("Rachel's phone rings...",
     ["rachel", "'s", "phone", "rings"]),
    # pycocoevalcap quirk: PUNCTUATIONS holds uppercase -LRB- while the
    # -lowerCase output is lowercase, so bracket tokens are NOT removed
    ("(laughs) loudly",
     ["-lrb-", "laughs", "-rrb-", "loudly"]),
    ("I'm gonna leave; she'll stay",
     ["i", "'m", "gon", "na", "leave", "she", "'ll", "stay"]),
    ("what?!", ["what"]),
]


def test_ptb_tokenize_golden():
    mismatches = [(src, got, want) for src, want in PTB_GOLDEN
                  if (got := ours.ptb_tokenize(src)) != want]
    assert not mismatches, mismatches


def test_porter_stemmer():
    from hero_tpu.evaluation.porter import porter_stem
    # classic Porter-paper examples
    for w, s in [("caresses", "caress"), ("ponies", "poni"),
                 ("running", "run"), ("agreed", "agre"),
                 ("plastered", "plaster"), ("motoring", "motor"),
                 ("happy", "happi"), ("relational", "relat"),
                 ("conditional", "condit"), ("rational", "ration"),
                 ("triplicate", "triplic"), ("formative", "form"),
                 ("adjustable", "adjust"), ("effective", "effect"),
                 ("probate", "probat"), ("controll", "control")]:
        assert porter_stem(w) == s, (w, porter_stem(w), s)


def test_meteor_python():
    """Pure-python METEOR: sanity properties (perfect match ≈ high, exact
    ordering beats scrambled, stem stage credits morphology)."""
    ref = "a man is playing a guitar".split()
    gts = {"0": [ref]}
    perfect = ours.meteor(gts, {"0": list(ref)})
    assert perfect > 0.9
    scrambled = ours.meteor(gts, {"0": ref[::-1]})
    assert perfect > scrambled > 0.0
    stemmy = ours.meteor(gts, {"0": "a man played a guitar".split()})
    nostem = ours.meteor(gts, {"0": "a man xxx a guitar".split()})
    assert stemmy > nostem
    assert ours.meteor(gts, {"0": ["zzz"]}) == 0.0
    # multi-reference takes the best reference
    gts2 = {"0": [["totally", "different"], ref]}
    assert ours.meteor(gts2, {"0": list(ref)}) == pytest.approx(perfect)


def test_tvc_eval_includes_meteor(tmp_path):
    import json
    ref = tmp_path / "refs.jsonl"
    with open(ref, "w") as f:
        f.write(json.dumps({
            "clip_id": 1,
            "descs": [{"desc": "A man walks into the room."}]}) + "\n")
        f.write(json.dumps({
            "clip_id": 2,
            "descs": [{"desc": "Two dogs chase a red ball."}]}) + "\n")
    ev = ours.TVCEval(str(ref))
    out = ev([{"clip_id": 1,
               "descs": [{"desc": "A man walks into the room."}]},
              {"clip_id": 2,
               "descs": [{"desc": "Two dogs chase a red ball."}]}])
    assert out["CIDEr"] > 0
    assert "METEOR" in out and 0.9 < out["METEOR"] <= 1.0
