"""Greedy longest-match WordPiece tokenizer — F5 re-derivation.

The reference uses HF `tokenizer.tokenize` over bert-base-uncased
(Bert_data_utils.py:43-66). The algorithm is greedy longest-prefix
matching against a subword vocab with '##' continuation pieces and
[UNK] fallback — re-implemented here without HF. The engine ships a
small default vocab for testing; a real bert vocab.txt loads with
`load_vocab` (one piece per line, id = line number — the HF format).
"""

from __future__ import annotations

UNK = "[UNK]"

_DEFAULT_PIECES = (
    "[PAD] [UNK] [CLS] [SEP] a b c d e f g h i j k l m n o p q r s t u v w x y z "
    "the and ing er est un re ware mal ran som apt at tack phish spear "
    "##s ##ing ##ed ##er ##ware ##net ##bot ##ware ##ry ##ot ##a ##b ##c ##d ##e "
    "##f ##g ##h ##i ##j ##k ##l ##m ##n ##o ##p ##q ##r ##s ##t ##u ##v ##w ##x "
    "##y ##z ##0 ##1 ##2 ##3 ##4 ##5 ##6 ##7 ##8 ##9 0 1 2 3 4 5 6 7 8 9 . - _"
).split()


def load_vocab(path: str) -> dict[str, int]:
    """HF vocab.txt: one piece per line, id = line number."""
    with open(path, encoding="utf-8") as f:
        return {line.rstrip("\n"): i for i, line in enumerate(f)}


def default_vocab() -> dict[str, int]:
    seen: dict[str, int] = {}
    for p in _DEFAULT_PIECES:
        if p not in seen:
            seen[p] = len(seen)
    return seen


def wordpiece(token: str, vocab: dict[str, int], max_chars: int = 100) -> list[str]:
    """Greedy longest-match subword split (the WordPiece algorithm):
    repeatedly take the longest vocab prefix ('##'-prefixed after the
    first piece); any unmatchable position → the whole token is [UNK]."""
    if len(token) > max_chars:
        return [UNK]
    pieces: list[str] = []
    start = 0
    n = len(token)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = token[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


def encode(tokens: list[str], vocab: dict[str, int], lower: bool = True) -> tuple[list[str], list[int]]:
    """tokens → (pieces, ids) with [UNK] fallback — the
    convert_tokens_to_ids path (Bert_data_utils.py:57-66)."""
    pieces: list[str] = []
    for t in tokens:
        pieces.extend(wordpiece(t.lower() if lower else t, vocab))
    unk = vocab.get(UNK, 0)
    return pieces, [vocab.get(p, unk) for p in pieces]
