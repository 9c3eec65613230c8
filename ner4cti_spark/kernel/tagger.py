"""The tagger kernel: Arrow batch of sentences → BIO tags → spans.

Composition mirrors the reference flagship forward (M10, model.py:390-491):
feature fusion (M1/M2) → BiLSTM (M3) → multi-head attention (M4) →
emission head, gate-fused (M8, model.py:455-465) with a second emission
branch, decoded by Viterbi over a BIO-constrained transition matrix
(M9/W5, CRF_classes.py:112-192).

Deviation (documented, SURVEY §5.2): the reference's BERT emission branch
needs torch+HF checkpoints that are neither in this environment nor in
the reference repo (.MISSING_LARGE_BLOBS). Its role — a high-precision
lexical-semantic emission signal — is filled by a deterministic
gazetteer/pattern emission model (`lexicon_emissions`), which is the
branch that carries entity identity; the numpy network supplies the
contextual branch. Swapping in real BERT weights changes only
`neural_emissions`' internals, none of the Spark plumbing.
"""

from __future__ import annotations

import numpy as np

from . import gazetteer, nn, pos
from .crf import greedy_decode, viterbi_decode
from .labels import CTI, LabelSpace

MAX_SEQ_LEN = 256  # arguments.py:33
LEX_HIT = 8.0
LEX_O = 2.0
LEX_OTHER = -2.0


def _stem(t: str) -> str:
    """Tiny deterministic suffix stripper for lexicon fallback matching."""
    for suf in ("ing", "ed", "es", "s"):
        if t.endswith(suf) and len(t) > len(suf) + 2:
            return t[: -len(suf)]
    return t


class TaggerKernel:
    def __init__(
        self,
        weights: dict[str, np.ndarray],
        neural_scale: float = 0.1,
        decode: str = "viterbi",
        phrases: dict[tuple[str, ...], tuple[str, str]] | None = None,
        use_patterns: bool = True,
        label_space: LabelSpace = CTI,
        sent_cache: bool = True,
        stem_fallback: bool = False,
    ) -> None:
        """phrases: token-tuple (lowercased) → (etype, canonical). Default
        is the built-in CTI gazetteer; pass a corpus-induced lexicon
        (e.g. from the DNRTI/MalwareDB train split, operators/conll.py)
        to retarget the tagger. use_patterns toggles the regex indicator
        classes (disable for tagsets without cve/indicator)."""
        self.w = weights
        p = weights["_profile"]
        (self.word_vocab, self.char_vocab, self.char_maxlen,
         self.hidden, self.layers, self.heads, self.d_model) = (int(x) for x in p)
        self.neural_scale = neural_scale
        self.decode = decode
        self.phrases = phrases if phrases is not None else gazetteer.phrase_index()
        self.max_phrase = max((len(k) for k in self.phrases), default=1)
        self.use_patterns = use_patterns
        # morphological fallback: stemmed phrase table ('loads and
        # executing' matches a lexicon entry 'load and execute'); exact
        # entries win on collision (exact checked first, and the stem
        # table keeps the first-inserted mapping deterministically)
        self.stem_fallback = stem_fallback
        self.stem_phrases: dict[tuple[str, ...], tuple[str, str]] = {}
        if stem_fallback:
            for k, v in sorted(self.phrases.items()):
                sk = tuple(_stem(w) for w in k)
                self.stem_phrases.setdefault(sk, v)
        self.ls = label_space
        assert weights["emit_b"].shape[0] == label_space.n, (
            "weights were built for a different label space — pass the same "
            "label_space to build_weights and TaggerKernel"
        )
        # per-executor caches: code corpora repeat tokens AND whole lines
        # heavily, so token-level features (word/char/pos/case), indicator
        # classes, and full per-sentence decode results are each computed
        # once per distinct input (exact sentence dedup, executor-local —
        # no shuffle, identical results by determinism)
        self._feat_cache: dict[str, np.ndarray] = {}
        self._class_cache: dict[str, str | None] = {}
        self._wp_vocab: dict[str, int] | None = None
        self._sent_cache: dict[tuple[str, ...], tuple[list[str], float]] = {}
        self._sent_cache_on = sent_cache
        # trained neural branch: resolved lazily ONCE per kernel — the
        # vocab→row lookup dict inside is O(vocab) to rebuild, far too
        # much to repeat per 128-sentence chunk
        self._neural_branch: tuple | None | bool = False  # False = unresolved

    def _branch(self):
        if self._neural_branch is False:
            from . import neural
            self._neural_branch = neural.branch_from_arts(self.w)
        return self._neural_branch

    # ---------------- emissions ----------------

    def lexicon_emissions(self, sents: list[list[str]], T: int) -> np.ndarray:
        """(B,T,L) log-potentials from longest-match gazetteer + indicator
        patterns. The high-precision branch (stands in for M7)."""
        B = len(sents)
        em = np.full((B, T, self.ls.n), LEX_OTHER, dtype=np.float32)
        em[:, :, self.ls.o_id] = LEX_O
        for b, sent in enumerate(sents):
            n = min(len(sent), T)
            i = 0
            while i < n:
                matched = 0
                for span in range(min(self.max_phrase, n - i), 0, -1):
                    key = tuple(t.lower() for t in sent[i : i + span])
                    hit = self.phrases.get(key)
                    if hit is None and self.stem_fallback:
                        hit = self.stem_phrases.get(tuple(_stem(w) for w in key))
                    if hit is not None:
                        etype = hit[0]
                        em[b, i, self.ls.label2id[f"B-{etype}"]] = LEX_HIT
                        em[b, i, self.ls.o_id] = LEX_OTHER
                        for j in range(i + 1, i + span):
                            em[b, j, self.ls.label2id[f"I-{etype}"]] = LEX_HIT
                            em[b, j, self.ls.o_id] = LEX_OTHER
                        matched = span
                        break
                if matched:
                    i += matched
                    continue
                if not self.use_patterns:
                    i += 1
                    continue
                tok = sent[i]
                if tok in self._class_cache:
                    etype = self._class_cache[tok]
                else:
                    etype = gazetteer.classify_token(tok)
                    self._class_cache[tok] = etype
                if etype is not None:
                    em[b, i, self.ls.label2id[f"B-{etype}"]] = LEX_HIT
                    em[b, i, self.ls.o_id] = LEX_OTHER
                i += 1
        return em

    def _token_features(self, tokens: list[str]) -> np.ndarray:
        """(N, feat_dim) rows for distinct tokens, cached per executor.
        Feature fusion M2 inputs: word(hash-emb) ‖ charCNN ‖ pos ‖ case —
        each a pure function of the token string, so distinct-token
        compute + gather replaces per-position recompute.

        Optional branches, switched by weight-bundle keys:
        - "_wp_pool" (A8): the character branch runs per WORDPIECE and
          mean-pools pieces back to the token (BertModel.py:81-114).
        - "_aug_neighbors" (M6): softmax-attention over each word's
          top-k similar words (corpus-trained Word2Vec neighbors),
          gate-fused into the word embedding
          (security_augmentation.py:86-126)."""
        w = self.w
        # snapshot the rows this call needs BEFORE any cache eviction:
        # the bounded-size clear below must not invalidate tokens already
        # gathered for THIS batch (crash seen at 100k-doc scale: a kernel
        # crossing the cache bound evicted the pad token mid-call and the
        # final stack raised KeyError — works-at-small-SF, dies-at-scale)
        rows = {t: self._feat_cache[t] for t in tokens if t in self._feat_cache}
        missing = [t for t in tokens if t not in rows]
        if missing:
            wid = nn.stable_hash_ids(np.array(missing, dtype=object), self.word_vocab)
            word_v = w["word_emb"][wid]                                  # (N,50)
            hard = w.get("_hard_aug_table")
            if hard:  # M5: precomputed fused table, keyed by EXACT vocab
                #       form — cased surface variants pass through
                #       unaugmented (they hash to different embedding
                #       rows; overriding them with the lowercase fusion
                #       would replace their base vector, which the soft
                #       path never does). Row overrides are safe: the
                #       fancy-indexed word_v above is already a copy.
                for i, t in enumerate(missing):
                    hv = hard.get(t)
                    if hv is not None:
                        word_v[i] = hv
            aug = w.get("_aug_neighbors")
            if aug and not hard:
                word_v = self._soft_augment(missing, word_v, aug)
            if "_wp_pool" in w:
                char_v = self._wordpiece_char_vecs(missing)
            else:
                cids = nn.char_ids([missing], len(missing), self.char_maxlen, self.char_vocab)[0]
                char_v = nn.char_cnn(
                    cids[:, None, :], w["char_emb"], w["char_conv_w"], w["char_conv_b"], 3
                )[:, 0, :]                                               # (N,30)
            case_id = np.array([casing_class(t) for t in missing], dtype=np.int64)
            case_v = w["case_emb"][case_id]
            # F4: heuristic UPOS (kernel/pos.py) — the reference's
            # stanza-UPOS 10-dim signal (data_utils.py:46-62), stanza-free
            pos_id = np.array([pos.upos_id(t) for t in missing], dtype=np.int64)
            pos_v = w["pos_emb"][pos_id % w["pos_emb"].shape[0]]
            feats = np.concatenate([word_v, char_v, pos_v, case_v], axis=-1).astype(np.float32)
            if len(self._feat_cache) > self.FEAT_CACHE_MAX:
                self._feat_cache.clear()
            for i, t in enumerate(missing):
                self._feat_cache[t] = feats[i]
                rows[t] = feats[i]
        return np.stack([rows[t] for t in tokens])

    def _wordpiece_char_vecs(self, tokens: list[str]) -> np.ndarray:
        """A8: char-CNN per wordpiece, mean-pooled back to tokens."""
        from . import wordpiece as wp

        vocab = self._wp_vocab
        if vocab is None:
            vocab = self._wp_vocab = wp.default_vocab()
        pieces: list[str] = []
        word_ids: list[int] = []
        for i, t in enumerate(tokens):
            ps = wp.wordpiece(t.lower(), vocab)
            pieces.extend(p.lstrip("#") or "#" for p in ps)
            word_ids.extend([i] * len(ps))
        cids = nn.char_ids([pieces], len(pieces), self.char_maxlen, self.char_vocab)[0]
        pv = nn.char_cnn(
            cids[:, None, :], self.w["char_emb"], self.w["char_conv_w"],
            self.w["char_conv_b"], 3,
        )[:, 0, :]
        return nn.wordpiece_mean_pool(pv, np.array(word_ids, dtype=np.int64), len(tokens))

    def _soft_augment(self, tokens: list[str], word_v: np.ndarray,
                      aug: dict) -> np.ndarray:
        """M6: gather each token's top-k similar words (corpus Word2Vec
        neighbors), embed them through the SAME hashed word table, fuse
        via softmax-attention + sigmoid gate (nn.soft_augment)."""
        K = max((len(v[0]) for v in aug.values()), default=0)
        if K == 0:
            return word_v
        N, D = word_v.shape
        nbr_vecs = np.zeros((N, K, D), dtype=word_v.dtype)
        nbr_sims = np.zeros((N, K), dtype=np.float32)
        nbr_mask = np.zeros((N, K), dtype=bool)
        flat_words: list[str] = []
        slots: list[tuple[int, int]] = []
        for i, t in enumerate(tokens):
            hit = aug.get(t.lower())
            if not hit:
                continue
            for j, (nw, sim) in enumerate(zip(hit[0][:K], hit[1][:K])):
                flat_words.append(nw)
                slots.append((i, j))
                nbr_sims[i, j] = sim
                nbr_mask[i, j] = True
        if not flat_words:
            return word_v
        ids = nn.stable_hash_ids(np.array(flat_words, dtype=object), self.word_vocab)
        vecs = self.w["word_emb"][ids]
        for (i, j), v in zip(slots, vecs):
            nbr_vecs[i, j] = v
        return nn.soft_augment(word_v, nbr_vecs, nbr_sims, nbr_mask)

    def neural_emissions(self, sents: list[list[str]], T: int, mask: np.ndarray) -> np.ndarray:
        """(B,T,L) contextual branch: M1→M2→M3→M4→linear, batched numpy."""
        w = self.w
        B = len(sents)
        uniq: dict[str, int] = {"": 0}
        for s in sents:
            for t in s[:T]:
                if t not in uniq:
                    uniq[t] = len(uniq)
        fmat = self._token_features(list(uniq))                          # (U,98)
        idx = np.zeros((B, T), dtype=np.int64)
        for b, s in enumerate(sents):
            for ti, t in enumerate(s[:T]):
                idx[b, ti] = uniq[t]
        x = fmat[idx]                                                    # (B,T,98)
        h = np.tanh(x @ w["proj_w"] + w["proj_b"])                      # (B,T,d_model)
        h = h + nn.sinusoidal_pe(T, h.shape[-1])                        # W3 positional encoding
        h = nn.bilstm(h, w, self.layers)                                # (B,T,2H)
        h = nn.multihead_attention(h, w, self.heads, mask)
        return h @ w["emit_w"] + w["emit_b"]                            # (B,T,L)

    # ---------------- decode ----------------

    CHUNK = 128  # sub-batch rows: keeps the LSTM/attention working set
    #              cache-resident — large padded batches go memory-
    #              bandwidth-bound when many workers run per box
    #              (measured best under 16-32-worker concurrency)

    FEAT_CACHE_MAX = 500_000  # bound on _feat_cache entries before a full
    #              clear — per-executor-task memory cap for the fused
    #              feature rows (98-dim float32 ≈ 400 B each → ~200 MB)

    def tag(self, sents: list[list[str]]) -> tuple[list[list[str]], np.ndarray]:
        """Batch decode → (BIO tag lists aligned 1:1 with tokens, scores).

        Sentences are length-bucketed before chunking: each sub-batch
        pads only to its own max length, so short code lines don't pay
        the long-line O(T)/O(T²) cost (the reference pads everything to
        the global maxlen, data_utils.py:208-219 — a deliberate
        physical-plan improvement, not a semantic change)."""
        if not sents:
            return [], np.zeros(0, dtype=np.float32)
        tags_out: list[list[str] | None] = [None] * len(sents)
        scores_out = np.zeros(len(sents), dtype=np.float32)
        # executor-local exact sentence dedup: decode each distinct
        # sentence once (cached across batches too). sent_cache=False
        # forces every row through the model — the inference-bound
        # benchmarking regime (real corpora dedup far less than the
        # template-generated synthetic one).
        todo: dict[tuple[str, ...], list[int]] = {}
        for i, s in enumerate(sents):
            key = tuple(s)
            hit = self._sent_cache.get(key) if self._sent_cache_on else None
            if hit is not None:
                tags_out[i] = hit[0]
                scores_out[i] = hit[1]
            elif self._sent_cache_on:
                todo.setdefault(key, []).append(i)
            else:
                todo[(str(i),)] = [i]  # unique pseudo-key: no dedup
        uniq = list(todo)
        order = sorted(range(len(uniq)), key=lambda i: len(sents[todo[uniq[i]][0]]))
        if len(self._sent_cache) > 1_000_000:
            self._sent_cache.clear()
        for start in range(0, len(order), self.CHUNK):
            idxs = order[start : start + self.CHUNK]
            chunk_keys = [uniq[i] for i in idxs]
            ctags, cscores = self._tag_chunk([sents[todo[k][0]] for k in chunk_keys])
            for j, key in enumerate(chunk_keys):
                t = ctags[j]
                # sentences beyond MAX_SEQ_LEN decode truncated; pad the
                # tail with 'O' so the output stays aligned 1:1 with the
                # input tokens (same contract as perceptron.decode_sents —
                # an eval join must never silently drop tokens past 256)
                n_in = len(sents[todo[key][0]])
                if len(t) < n_in:
                    t = t + ["O"] * (n_in - len(t))
                if self._sent_cache_on:
                    self._sent_cache[key] = (t, float(cscores[j]))
                for i in todo[key]:
                    tags_out[i] = t
                    scores_out[i] = cscores[j]
        return tags_out, scores_out  # type: ignore[return-value]

    def _tag_chunk(self, sents: list[list[str]]) -> tuple[list[list[str]], np.ndarray]:
        lengths = np.array([min(len(s), MAX_SEQ_LEN) for s in sents], dtype=np.int64)
        T = max(1, int(lengths.max()))
        sents = [s[:MAX_SEQ_LEN] for s in sents]
        mask = np.arange(T)[None, :] < lengths[:, None]
        if "sp_w" in self.w:
            return self._tag_chunk_trained(sents, lengths, T)
        em = self.lexicon_emissions(sents, T)
        if self.neural_scale > 0.0:
            neural = self.neural_emissions(sents, T, mask)
            # gate fusion M8: sigmoid gate over both branches
            g = 1.0 / (1.0 + np.exp(-np.clip(
                np.concatenate([em, neural], axis=-1) @ self.w["gate_w"] + self.w["gate_b"],
                -30, 30)))
            em = em + self.neural_scale * g * np.tanh(neural)
        if self.decode == "viterbi":
            paths, scores = viterbi_decode(em, self.w["trans"], lengths)
        else:
            paths = greedy_decode(em, lengths)
            scores = np.take_along_axis(em, paths[:, :, None], axis=2)[:, :, 0].sum(axis=1)
        tags = [
            [self.ls.id2label[int(paths[b, t])] for t in range(int(lengths[b]))]
            for b in range(len(sents))
        ]
        scores = (scores / np.maximum(lengths, 1)).astype(np.float32)
        return tags, scores

    def _tag_chunk_trained(self, sents: list[list[str]], lengths: np.ndarray, T: int
                           ) -> tuple[list[list[str]], np.ndarray]:
        """Decode with TRAINED perceptron-CRF weights (kernel/perceptron.py)
        when the bundle carries "sp_w": hashed sparse features (lexicon
        longest-match included as features) → batched Viterbi. Replaces
        the gazetteer-potentials + random-neural fusion for corpora with
        a fitted model; the Spark plumbing above is identical.

        Two-pass bundles ("sp2_w"/"clf_w") run the sentence-attribution
        gate first: gated sentences take the attributed-trained decode
        (batched Viterbi over the gated subset), everything else —
        including gated sentences whose attr decode is all-O — falls
        back to the full-split model. Semantics identical to
        perceptron.decode_sents (parity-tested)."""
        from . import neural
        from . import perceptron as P

        W = self.w["sp_w"]
        buckets, L = W.shape
        use_patterns = bool(self.w["_sp_meta"][1]) if "_sp_meta" in self.w else self.use_patterns
        clusters = self.w.get("_sp_clusters")
        mask_t, em_mask, first_mask = P._decode_masks(self.ls)
        nb = self._branch()
        B = len(sents)
        feats_by_sent: list[np.ndarray | None] = [None] * B
        nn_add_by_sent: list[np.ndarray | None] = [None] * B
        em = np.zeros((B, T, L), dtype=np.float32)
        em += em_mask[None, None, :]
        lps = None
        if nb is not None:
            members, nemb, nlook, nmode, nlam = nb
            lps = neural.batch_logprob(
                [sents[b][: int(lengths[b])] for b in range(B)],
                members, nemb, nlook,
            )
        for b, sent in enumerate(sents):
            n = int(lengths[b])
            if n == 0:
                continue
            ex = None
            if nb is not None:
                lp = lps[b]
                if nmode == neural.MODE_STACK:
                    ex = neural.stack_extra(lp, self.ls.id2label)
                elif nmode == neural.MODE_SCORE:
                    nn_add_by_sent[b] = (nlam * lp).astype(np.float32)
            feats = P._sent_features(sent[:n], self.phrases, self.max_phrase,
                                     use_patterns, buckets, clusters, extra=ex)
            feats_by_sent[b] = feats
            em[b, :n, :] = W[feats].sum(axis=1) + em_mask
            if nn_add_by_sent[b] is not None:
                em[b, :n, :] += nn_add_by_sent[b]
            em[b, 0, :] += first_mask
        paths, scores = viterbi_decode(em, self.w["sp_trans"] + mask_t, lengths)
        tags = [
            [self.ls.id2label[int(paths[b, t])] for t in range(int(lengths[b]))]
            for b in range(B)
        ]
        if "sp2_w" in self.w and "clf_w" in self.w:
            W2 = self.w["sp2_w"]
            TR2m = self.w["sp2_trans"] + mask_t
            CW = self.w["clf_w"]
            o_id = self.ls.o_id
            # classifier pass: candidates = sentences above the low bar
            cand = []
            cscores = np.zeros(B)
            emb_pair = (neural.emb_from_arts(self.w)
                        if "clf_dw" in self.w else None)
            for b, sent in enumerate(sents):
                n = int(lengths[b])
                if n == 0:
                    continue
                c = float(CW[P.clf_features(sent[:n], self.phrases,
                                            self.max_phrase, clusters)].sum())
                if emb_pair is not None:
                    c += float(self.w["clf_dw"] @ P.sent_mean_emb(
                        sent[:n], emb_pair[1], emb_pair[0]))
                cscores[b] = c
                if c > P.GATE_C_LO:
                    cand.append(b)
            if cand:
                em2 = np.zeros((len(cand), T, L), dtype=np.float32)
                em2 += em_mask[None, None, :]
                for j, b in enumerate(cand):
                    n = int(lengths[b])
                    em2[j, :n, :] = W2[feats_by_sent[b]].sum(axis=1) + em_mask
                    if nn_add_by_sent[b] is not None:
                        em2[j, :n, :] += nn_add_by_sent[b]
                    em2[j, 0, :] += first_mask
                p2, s2 = viterbi_decode(em2, TR2m, lengths[cand])
                for j, b in enumerate(cand):
                    n = int(lengths[b])
                    allo = em2[j, :n, o_id].sum() + (n - 1) * TR2m[o_id, o_id]
                    gated = cscores[b] > P.GATE_C_HI or (
                        float(s2[j]) - allo > P.GATE_M_TAU
                    )
                    if gated and (p2[j, :n] != o_id).any():
                        attr_tags = [self.ls.id2label[int(p2[j, t])]
                                     for t in range(n)]
                        # span-level union: attr spans win, plus base
                        # spans that don't overlap them (decode_sents ≡)
                        tags[b] = P.merge_tag_spans(attr_tags, tags[b])
                        scores[b] = s2[j]
        return tags, (scores / np.maximum(lengths, 1)).astype(np.float32)


def build_hard_aug_table(weights: dict[str, np.ndarray],
                         neighbors: dict[str, tuple[tuple[str, ...], tuple[float, ...]]]
                         ) -> dict[str, np.ndarray]:
    """M5 hard augmentation (security_augmentation.py:68-83; gate
    model.py:417-438): precompute, for every vocabulary word with
    similar-word neighbors, the gate-fused augmented embedding as a
    broadcastable table — the reference's 'hard' variant bakes the fusion
    into a lookup table offline, while 'soft' (M6, nn.soft_augment inside
    `_soft_augment`) computes the identical fusion at inference.
    hard(w) ≡ soft(w) for exact vocabulary forms (parity tested); they
    deliberately differ on CASED surface variants — hard is a table keyed
    by vocab form (cased tokens pass through), soft looks neighbors up by
    lowercased form and fuses into the cased token's own embedding.
    Ship the result as weights['_hard_aug_table']."""
    word_vocab = weights["word_emb"].shape[0]
    words = sorted(neighbors)
    if not words:
        return {}
    ids = nn.stable_hash_ids(np.array(words, dtype=object), word_vocab)
    X = weights["word_emb"][ids]
    K = max(len(neighbors[w][0]) for w in words)
    D = X.shape[1]
    nbr_vecs = np.zeros((len(words), K, D), dtype=X.dtype)
    nbr_sims = np.zeros((len(words), K), dtype=np.float32)
    nbr_mask = np.zeros((len(words), K), dtype=bool)
    for i, w in enumerate(words):
        ws, sims = neighbors[w]
        nids = nn.stable_hash_ids(np.array(list(ws), dtype=object), word_vocab)
        nbr_vecs[i, : len(ws)] = weights["word_emb"][nids]
        nbr_sims[i, : len(ws)] = sims
        nbr_mask[i, : len(ws)] = True
    fused = nn.soft_augment(X, nbr_vecs, nbr_sims, nbr_mask)
    return {w: fused[i] for i, w in enumerate(words)}


def casing_class(tok: str) -> int:
    """8-class casing/morphology id — exact re-derivation of the
    reference's get_token_case / case_feature (data_utils.py:135-162):
    ids {allNum:0, allLower:1, allUpper:2, upperInit:3, other:4,
    main_num:5, contain_num:6, [PAD]:7}, checks in reference order
    (isdigit → digit_prop>0.5 → islower → isupper → istitle →
    contains-digit → other). Empty/pad token → [PAD]=7 (the reference
    never sees empty tokens; this is the padding id)."""
    if not tok:
        return 7
    n_digits = sum(c.isdigit() for c in tok.strip())
    digit_prop = n_digits / float(len(tok))
    if tok.isdigit():
        return 0
    if digit_prop > 0.5:
        return 5
    if tok.islower():
        return 1
    if tok.isupper():
        return 2
    if tok.istitle():
        return 3
    if n_digits > 0:
        return 6
    return 4


def lookup_canonical(phrases: dict[tuple[str, ...], tuple[str, str]],
                     span_tokens: list[str], etype: str) -> str | None:
    """Canonical-name hint for a decoded span: the lexicon's canonical
    form when the span is an exact (lowercased) phrase entry of the same
    etype. Knowledge-based linking prior — 'Sofacy' hints 'APT28'."""
    hit = phrases.get(tuple(t.lower() for t in span_tokens))
    if hit is not None and hit[0] == etype:
        return hit[1]
    return None


def extract_spans(tokens: list[str], tags: list[str]) -> list[tuple[int, int, str, str]]:
    """BIO run grouping (W8): (begin, end_exclusive, surface, etype)."""
    spans: list[tuple[int, int, str, str]] = []
    i = 0
    n = min(len(tokens), len(tags))
    while i < n:
        tag = tags[i]
        if tag.startswith("B-"):
            etype = tag[2:]
            j = i + 1
            while j < n and tags[j] == f"I-{etype}":
                j += 1
            spans.append((i, j, " ".join(tokens[i:j]), etype))
            i = j
        else:
            i += 1
    return spans
