"""BIO label space for the engine.

Mirrors the reference's label-id convention (data_utils.py:120-125):
specials first ([BOS]=0, [EOS]=1, [X]=2), then tags. Our tagset is the
north-star CTI classes (BASELINE.json) mapped from DNRTI per SURVEY §1.3.
"""

from __future__ import annotations

from .gazetteer import ETYPES

SPECIALS = ["[BOS]", "[EOS]", "[X]"]

TAGS = ["O"] + [f"{p}-{e}" for e in ETYPES for p in ("B", "I")]

LABELS = SPECIALS + TAGS
LABEL2ID = {t: i for i, t in enumerate(LABELS)}
ID2LABEL = {i: t for t, i in LABEL2ID.items()}
N_LABELS = len(LABELS)
O_ID = LABEL2ID["O"]


def bio_transition_mask() -> "list[list[float]]":
    """(N, N) additive mask: I-X reachable only from B-X / I-X; specials
    unreachable at inference. Returned as plain lists (numpy-free module)."""
    NEG = -1e4
    mask = [[0.0] * N_LABELS for _ in range(N_LABELS)]
    for j, to_tag in enumerate(LABELS):
        for i, from_tag in enumerate(LABELS):
            bad = False
            if to_tag in SPECIALS:
                bad = True
            elif to_tag.startswith("I-"):
                etype = to_tag[2:]
                if from_tag not in (f"B-{etype}", f"I-{etype}"):
                    bad = True
            if bad:
                mask[i][j] = NEG
    return mask
