"""CRF decode/score in batched numpy — SURVEY W5/W6.

Re-derivation of the reference's per-sentence DP (CRF_classes.py:48-192)
vectorized over the batch AND label axes: alpha updates are (B, L, L)
broadcasts instead of the reference's per-label Python loops
(CRF_classes.py:58,125)."""

from __future__ import annotations

import numpy as np


def viterbi_decode(emissions: np.ndarray, trans: np.ndarray, lengths: np.ndarray
                   ) -> tuple[np.ndarray, np.ndarray]:
    """Max-sum DP. emissions (B,T,L), trans (L,L) additive log-potentials,
    lengths (B,). Returns (paths (B,T) int32, scores (B,) float32).
    Positions ≥ length are zero-filled."""
    B, T, L = emissions.shape
    alpha = emissions[:, 0, :].astype(np.float32).copy()          # (B,L)
    back = np.zeros((B, T, L), dtype=np.int32)
    for t in range(1, T):
        # score of arriving in j from i: alpha[:,i] + trans[i,j]
        cand = alpha[:, :, None] + trans[None, :, :]              # (B,L,L)
        best_prev = cand.argmax(axis=1)                           # (B,L)
        best_score = np.take_along_axis(cand, best_prev[:, None, :], axis=1)[:, 0, :]
        step = best_score + emissions[:, t, :]
        active = (t < lengths)[:, None]
        alpha = np.where(active, step, alpha)
        back[:, t, :] = np.where(active, best_prev, 0)
    paths = np.zeros((B, T), dtype=np.int32)
    scores = np.zeros(B, dtype=np.float32)
    last = np.clip(lengths - 1, 0, T - 1)
    idx = np.arange(B)
    paths[idx, last] = alpha.argmax(axis=1)
    scores[:] = alpha.max(axis=1)
    for t in range(T - 2, -1, -1):
        nxt = paths[idx, np.minimum(t + 1, last)]
        prev = back[idx, np.minimum(t + 1, last), nxt]
        use = t < last
        paths[:, t] = np.where(use, prev, paths[:, t])
    # zero out padding
    mask = np.arange(T)[None, :] >= lengths[:, None]
    paths[mask] = 0
    return paths, scores


def forward_logZ(emissions: np.ndarray, trans: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """log partition function (training-side W6); kept for parity tests."""
    B, T, L = emissions.shape
    alpha = emissions[:, 0, :].astype(np.float64).copy()
    for t in range(1, T):
        cand = alpha[:, :, None] + trans[None, :, :]              # (B,L,L)
        m = cand.max(axis=1)
        step = m + np.log(np.exp(cand - m[:, None, :]).sum(axis=1)) + emissions[:, t, :]
        active = (t < lengths)[:, None]
        alpha = np.where(active, step, alpha)
    m = alpha.max(axis=1)
    return m + np.log(np.exp(alpha - m[:, None]).sum(axis=1))


def greedy_decode(emissions: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Argmax decode (utils.py:10-20, W7)."""
    paths = emissions.argmax(axis=-1).astype(np.int32)
    mask = np.arange(emissions.shape[1])[None, :] >= lengths[:, None]
    paths[mask] = 0
    return paths
