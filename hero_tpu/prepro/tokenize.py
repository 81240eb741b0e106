"""Tokenization for prepro (reference uses RobertaTokenizer,
``scripts/prepro_sub.py:246-253``): html-unescape, lowercase if ALL-CAPS,
RoBERTa BPE.  Falls back to a deterministic hash tokenizer when the
transformers vocab is unavailable (offline environments); the db format is
identical either way."""

from __future__ import annotations

import html
from typing import Callable, List


def roberta_tokenizer() -> Callable[[str], List[int]]:
    from transformers import RobertaTokenizer
    tok = RobertaTokenizer.from_pretrained("roberta-base")

    def fn(text: str) -> List[int]:
        text = html.unescape(text)
        if text.isupper():
            text = text.lower()
        ids = tok.convert_tokens_to_ids(tok.tokenize(text))
        return ids
    return fn


def hash_tokenizer(vocab_range=(3, 50260)) -> Callable[[str], List[int]]:
    lo, hi = vocab_range

    def fn(text: str) -> List[int]:
        text = html.unescape(text)
        if text.isupper():
            text = text.lower()
        import zlib
        return [lo + (zlib.crc32(w.encode()) % (hi - lo))
                for w in text.split()]
    return fn


def get_tokenizer(name: str = "roberta") -> Callable[[str], List[int]]:
    if name == "roberta":
        try:
            return roberta_tokenizer()
        except Exception:
            from hero_tpu.utils.logger import LOGGER
            LOGGER.warning("RobertaTokenizer unavailable — falling back to "
                           "hash tokenizer (token ids will NOT match "
                           "reference dbs)")
            return hash_tokenizer()
    if name == "hash":
        return hash_tokenizer()
    raise ValueError(name)
