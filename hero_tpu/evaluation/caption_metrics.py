"""Caption metrics: BLEU-4, ROUGE-L, CIDEr-D (pure python), METEOR (gated).

Replaces the reference's vendored ``eval/pycocoevalcap`` + Java jars
(``eval/tvc.py:17-51``, Dockerfile:26-34).  BLEU/ROUGE-L/CIDEr-D follow the
standard COCO-caption definitions (brevity penalty on the closest reference
length, corpus-level geometric mean for BLEU; CIDEr-D with length-gaussian
penalty, sigma 6.0, n=1..4, ×10 scaling).  METEOR requires the Java jar; if
``java`` is absent it is skipped with a warning (off the training hot path,
eval-only, exactly the reference's dependency).

Tokenization: the reference shells out to Stanford PTBTokenizer.
:func:`ptb_tokenize` is a python approximation handling the same
punctuation/contraction conventions for the TVC captions domain.
"""

from __future__ import annotations

import math
import re
import shutil
from collections import Counter, defaultdict
from typing import Dict, List, Sequence

from hero_tpu.utils.logger import LOGGER

_PUNCT = ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
          ".", "?", "!", ",", ":", "-", "--", "...", ";"]


def ptb_tokenize(text: str) -> List[str]:
    """PTB-style tokenization approximation (lowercase, split punctuation,
    keep contractions attached like PTBTokenizer's n't/'s handling)."""
    t = text.lower().strip()
    t = re.sub(r"([.,!?;:])", r" \1 ", t)
    t = re.sub(r"\(", " -lrb- ", t)
    t = re.sub(r"\)", " -rrb- ", t)
    t = re.sub(r"(n't)\b", r" \1", t)
    t = re.sub(r"'(s|re|ve|ll|d|m)\b", r" '\1", t)
    toks = t.split()
    return [w for w in toks if w not in {p.lower() for p in _PUNCT}]


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n])
                   for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# BLEU (corpus-level, COCO convention: closest ref length, method0 smoothing)
# ---------------------------------------------------------------------------

def bleu(gts: Dict[str, List[List[str]]], res: Dict[str, List[str]],
         max_n: int = 4) -> List[float]:
    """Corpus BLEU-1..max_n over tokenized hypotheses/references."""
    tiny, small = 1e-15, 1e-9
    correct = [0.0] * max_n
    total = [0.0] * max_n
    hyp_len = 0
    ref_len = 0
    for key, hyp in res.items():
        refs = gts[key]
        hyp_len += len(hyp)
        ref_len += min((abs(len(r) - len(hyp)), len(r))
                       for r in refs)[1]
        for n in range(1, max_n + 1):
            h_ng = _ngrams(hyp, n)
            max_ref = Counter()
            for r in refs:
                for ng, c in _ngrams(r, n).items():
                    max_ref[ng] = max(max_ref[ng], c)
            correct[n - 1] += sum(min(c, max_ref[ng])
                                  for ng, c in h_ng.items())
            total[n - 1] += max(0, len(hyp) - n + 1)
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len /
                                                max(hyp_len, 1))
    scores = []
    p_log_sum = 0.0
    for n in range(max_n):
        p = (correct[n] + tiny) / (total[n] + small)
        p_log_sum += math.log(p)
        scores.append(bp * math.exp(p_log_sum / (n + 1)))
    return scores


# ---------------------------------------------------------------------------
# ROUGE-L (COCO convention: beta=1.2, mean over refs... max over refs)
# ---------------------------------------------------------------------------

def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(cur[-1], prev[j + 1]))
        prev = cur
    return prev[-1]


def rouge_l(gts: Dict[str, List[List[str]]],
            res: Dict[str, List[str]], beta: float = 1.2) -> float:
    scores = []
    for key, hyp in res.items():
        precs, recs = [], []
        for ref in gts[key]:
            lcs = _lcs_len(hyp, ref)
            precs.append(lcs / len(hyp) if hyp else 0.0)
            recs.append(lcs / len(ref) if ref else 0.0)
        # COCO convention: max precision and max recall taken separately
        # across references, then combined
        p, r = max(precs), max(recs)
        if p and r:
            scores.append((1 + beta ** 2) * p * r / (r + beta ** 2 * p))
        else:
            scores.append(0.0)
    return sum(scores) / max(len(scores), 1)


# ---------------------------------------------------------------------------
# CIDEr-D
# ---------------------------------------------------------------------------

def cider_d(gts: Dict[str, List[List[str]]], res: Dict[str, List[str]],
            n_max: int = 4, sigma: float = 6.0) -> float:
    # document frequencies over reference sets
    doc_freq = [Counter() for _ in range(n_max)]
    for refs in gts.values():
        for n in range(1, n_max + 1):
            seen = set()
            for r in refs:
                seen.update(_ngrams(r, n).keys())
            for ng in seen:
                doc_freq[n - 1][ng] += 1
    log_n_docs = math.log(max(len(gts), 1))

    def tfidf_vec(tokens):
        vecs, norms = [], []
        for n in range(1, n_max + 1):
            cnt = _ngrams(tokens, n)
            vec = {}
            norm = 0.0
            for ng, c in cnt.items():
                df = math.log(max(doc_freq[n - 1][ng], 1.0))
                w = c * (log_n_docs - df)
                vec[ng] = w
                norm += w * w
            vecs.append(vec)
            norms.append(math.sqrt(norm))
        return vecs, norms

    scores = []
    for key, hyp in res.items():
        h_vecs, h_norms = tfidf_vec(hyp)
        score = [0.0] * n_max
        for ref in gts[key]:
            r_vecs, r_norms = tfidf_vec(ref)
            delta = len(hyp) - len(ref)
            for n in range(n_max):
                prod = sum(min(h_vecs[n].get(ng, 0.0), w) * w
                           for ng, w in r_vecs[n].items())
                if h_norms[n] and r_norms[n]:
                    s = prod / (h_norms[n] * r_norms[n])
                else:
                    s = 0.0
                s *= math.exp(-delta ** 2 / (2 * sigma ** 2))
                score[n] += s
        n_refs = max(len(gts[key]), 1)
        scores.append(10.0 * sum(sc / n_refs for sc in score) / n_max)
    return sum(scores) / max(len(scores), 1)


def meteor_available() -> bool:
    return shutil.which("java") is not None


class TVCEval:
    """Caption evaluator (reference eval/tvc.py:17-51): preload refs, score
    a submission of {"clip_id": ..., "descs": [{"desc": str}]} records."""

    def __init__(self, ref_jsonl_path: str):
        import json
        self.gts: Dict[str, List[List[str]]] = {}
        with open(ref_jsonl_path) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                cid = str(d["clip_id"])
                self.gts[cid] = [ptb_tokenize(e["desc"])
                                 for e in d["descs"]]

    def __call__(self, submission: List[dict]) -> Dict[str, float]:
        res = {}
        for d in submission:
            cid = str(d["clip_id"])
            if cid in self.gts:
                res[cid] = ptb_tokenize(d["descs"][0]["desc"])
        gts = {k: self.gts[k] for k in res}
        bleu_scores = bleu(gts, res)
        out = {
            "Bleu@4": round(bleu_scores[3], 4),
            "ROUGE-L": round(rouge_l(gts, res), 4),
            "CIDEr": round(cider_d(gts, res), 4),
        }
        if meteor_available():
            out["METEOR"] = self._meteor(gts, res)
        else:
            LOGGER.warning("java not found — METEOR skipped")
        return out

    def _meteor(self, gts, res):  # pragma: no cover - requires java
        raise NotImplementedError(
            "METEOR jar integration requires meteor-1.5.jar; "
            "install java + jar and wire here")
