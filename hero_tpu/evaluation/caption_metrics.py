"""Caption metrics: BLEU-4, ROUGE-L, CIDEr-D, METEOR — all pure python.

Replaces the reference's vendored ``eval/pycocoevalcap`` + Java jars
(``eval/tvc.py:17-51``, Dockerfile:26-34).  BLEU/ROUGE-L/CIDEr-D follow the
standard COCO-caption definitions (brevity penalty on the closest reference
length, corpus-level geometric mean for BLEU; CIDEr-D with length-gaussian
penalty, sigma 6.0, n=1..4, ×10 scaling) and are differential-tested
against pycocoevalcap.  METEOR is a dependency-free reimplementation
(exact + Porter-stem matcher stages; see :func:`meteor`).

Tokenization: the reference shells out to the Stanford PTBTokenizer jar.
:func:`ptb_tokenize` reimplements the Penn-Treebank rules + the
pycocoevalcap punctuation filter in python, golden-tested against known
jar outputs (tests/test_caption_metrics.py::PTB_GOLDEN).
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


# Penn-Treebank tokenization rules (Robert MacIntyre's public-domain
# tokenizer.sed contractions/punctuation conventions, which the Stanford
# PTBTokenizer follows for plain English text).  Order matters.
_PTB_STARTING_QUOTES = [
    (re.compile(r"^\""), r"``"),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r"([ \(\[{<])(\"|\'{2})"), r"\1 `` "),
]
_PTB_PUNCT_RULES = [
    (re.compile(r"([:,])([^\d])"), r" \1 \2"),      # not inside numbers
    (re.compile(r"([:,])$"), r" \1 "),
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # final period (keeps abbreviation periods like u.s. attached)
    (re.compile(r"([^\.])(\.)([\]\)}>\"\']*)\s*$"), r"\1 \2\3 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"([^'])' "), r"\1 ' "),
]
_PTB_BRACKETS = [
    (re.compile(r"\("), " -LRB- "), (re.compile(r"\)"), " -RRB- "),
    (re.compile(r"\["), " -LSB- "), (re.compile(r"\]"), " -RSB- "),
    (re.compile(r"\{"), " -LCB- "), (re.compile(r"\}"), " -RCB- "),
    (re.compile(r"--"), " -- "),
]
_PTB_ENDING_QUOTES = [
    (re.compile(r"\""), " '' "),
    (re.compile(r"(\S)(\'\')"), r"\1 \2 "),
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) "), r"\1 \2 "),
]
_PTB_CONTRACTIONS = [
    re.compile(r"\b(can)(not)\b", re.IGNORECASE),
    re.compile(r"\b(gon)(na)\b", re.IGNORECASE),
    re.compile(r"\b(got)(ta)\b", re.IGNORECASE),
    re.compile(r"\b(lem)(me)\b", re.IGNORECASE),
    re.compile(r"\b(wan)(na)\b", re.IGNORECASE),
    re.compile(r"\b(gim)(me)\b", re.IGNORECASE),
]


def ptb_tokenize_raw(text: str) -> List[str]:
    """Penn-Treebank word tokenization of one caption (the rules the
    Stanford PTBTokenizer applies to plain text), lowercased like the
    ``-lowerCase`` flag pycocoevalcap passes.  No punctuation filtering."""
    t = " " + text.replace("\n", " ") + " "
    for pat, rep in _PTB_STARTING_QUOTES:
        t = pat.sub(rep, t)
    for pat, rep in _PTB_PUNCT_RULES:
        t = pat.sub(rep, t)
    for pat, rep in _PTB_BRACKETS:
        t = pat.sub(rep, t)
    t = " " + t + " "
    for pat, rep in _PTB_ENDING_QUOTES:
        t = pat.sub(rep, t)
    for pat in _PTB_CONTRACTIONS:
        t = pat.sub(r"\1 \2", t)
    return t.lower().split()


def ptb_tokenize(text: str) -> List[str]:
    """PTB tokenization + pycocoevalcap's punctuation filter
    (``tokenizer/ptbtokenizer.py``: tokens in PUNCTUATIONS are dropped).

    Quirk preserved: the reference filter list holds UPPERCASE bracket
    tokens while the jar's -lowerCase output is lowercase, so ``-lrb-``
    etc. are NOT removed — we reproduce that exactly, since the filter
    feeds every caption metric."""
    return [w for w in ptb_tokenize_raw(text) if w not in _PUNCT]


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


# ---------------------------------------------------------------------------
# METEOR (pure python: exact + Porter-stem modules)
# ---------------------------------------------------------------------------
#
# Implements METEOR with the original published scoring (Banerjee & Lavie
# 2005: Fmean = 10PR/(R+9P) i.e. alpha=0.9, penalty = 0.5·(chunks/matches)³)
# and the 1.x matcher-module weighting (exact 1.0, stem 0.6).  The 1.5 jar
# additionally runs WordNet synonym/paraphrase modules (data unavailable
# offline) and a function-word discount — omitted, so absolute values
# differ somewhat from jar-produced numbers; ordering tracks closely.
# System score micro-averages the sufficient statistics over segments, as
# the jar's final score does.

_MET_ALPHA, _MET_BETA, _MET_GAMMA = 0.9, 3.0, 0.5
_MET_WEIGHTS = (1.0, 0.6)  # exact, stem


def _meteor_align(hyp: List[str], ref: List[str]):
    """Stage-wise greedy alignment.  Returns (weighted_matches, n_matches,
    n_chunks) — matches in stage order exact → stem, each hyp/ref word
    used at most once, chunks counted on the final alignment."""
    from hero_tpu.evaluation.porter import porter_stem
    h_used = [False] * len(hyp)
    r_used = [False] * len(ref)
    align = {}  # hyp idx -> ref idx
    weighted = 0.0
    for w, key in zip(_MET_WEIGHTS,
                      (lambda t: t, porter_stem)):
        r_keys = [key(t) for t in ref]
        for i, t in enumerate(hyp):
            if h_used[i]:
                continue
            ht = key(t)
            for j, rt in enumerate(r_keys):
                if not r_used[j] and ht == rt:
                    h_used[i] = True
                    r_used[j] = True
                    align[i] = j
                    weighted += w
                    break
    m = len(align)
    if m == 0:
        return 0.0, 0, 0
    chunks = 0
    prev = None
    for i in sorted(align):
        if prev is None or align[i] != align[prev] + 1 or i != prev + 1:
            chunks += 1
        prev = i
    return weighted, m, chunks


def meteor(gts: Dict[str, List[List[str]]], res: Dict[str, List[str]]
           ) -> float:
    """Corpus METEOR over tokenized hypotheses/references (best reference
    per segment; system score from summed statistics)."""
    tot_w_h = tot_w_r = tot_hlen = tot_rlen = 0.0
    tot_m = tot_ch = 0
    for key, hyp in res.items():
        best = None
        for ref in gts[key]:
            w, m, ch = _meteor_align(hyp, ref)
            p = w / len(hyp) if hyp else 0.0
            r = w / len(ref) if ref else 0.0
            if p + r:
                f = p * r / (_MET_ALPHA * p + (1 - _MET_ALPHA) * r)
            else:
                f = 0.0
            pen = _MET_GAMMA * (ch / m) ** _MET_BETA if m else 0.0
            score = (1 - pen) * f
            cand = (score, w, m, ch, len(ref))
            if best is None or cand[0] > best[0]:
                best = cand
        if best is None:
            continue
        _, w, m, ch, rlen = best
        tot_w_h += w
        tot_w_r += w
        tot_hlen += len(hyp)
        tot_rlen += rlen
        tot_m += m
        tot_ch += ch
    if not tot_hlen or not tot_rlen or not tot_m:
        return 0.0
    p = tot_w_h / tot_hlen
    r = tot_w_r / tot_rlen
    if p + r == 0:
        return 0.0
    f = p * r / (_MET_ALPHA * p + (1 - _MET_ALPHA) * r)
    pen = _MET_GAMMA * (tot_ch / tot_m) ** _MET_BETA
    return (1 - pen) * f


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
        # pure-python METEOR (exact + Porter-stem modules, METEOR-1.5 en
        # parameters; see meteor() docstring for the delta vs the jar)
        out["METEOR"] = round(meteor(gts, res), 4)
        return out
