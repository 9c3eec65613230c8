"""Model artifact I/O — S3/S5/S6 of the reference's source/sink surface.

- save_weights / load_weights: the engine's checkpoint format (npz),
  replacing the reference's torch.save dicts (main.py:188-191) and
  np.save embedding tables (data_processing.py:183-192). Ships alongside
  the job via --py-files/--archives; broadcast once per job.
- load_glove: parses GloVe text format (data_utils.py:386-423) into a
  dict[str, np.ndarray]; merge_glove pins matching rows of the word
  embedding table to pretrained vectors (lowercase fallback + keep-random
  default, mirroring data_utils.py:248-260).
"""

from __future__ import annotations

import numpy as np


def save_weights(weights: dict[str, np.ndarray], path: str) -> None:
    np.savez_compressed(path, **weights)


def load_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def load_glove(path: str) -> dict[str, np.ndarray]:
    """GloVe text: `word v1 v2 ... vd` per line (data_utils.py:386-423).
    Malformed lines are skipped like the reference skips unparseable
    vectors."""
    out: dict[str, np.ndarray] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if len(parts) < 2:
                continue
            try:
                vec = np.asarray([float(x) for x in parts[1:]], dtype=np.float32)
            except ValueError:
                continue
            out[parts[0]] = vec
    return out


def merge_glove(
    weights: dict[str, np.ndarray],
    glove: dict[str, np.ndarray],
    vocab: dict[str, int],
) -> dict[str, np.ndarray]:
    """Overwrite word-embedding rows for vocab words found in GloVe
    (exact, then lowercase fallback — J4 semantics, data_utils.py:248-260);
    unmatched rows keep their seeded random init."""
    emb = weights["word_emb"].copy()
    dim = emb.shape[1]
    for word, idx in vocab.items():
        if idx >= emb.shape[0]:
            continue
        vec = glove.get(word)
        if vec is None:
            vec = glove.get(word.lower())
        if vec is not None and vec.shape[0] == dim:
            emb[idx] = vec
    out = dict(weights)
    out["word_emb"] = emb
    return out
