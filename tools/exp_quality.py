"""Driver-local experiment harness for tagger quality work.

Loads the reference corpora with a pure-python CoNLL reader (same
semantics as operators/conll.read_conll), trains perceptron-CRF variants
without Spark in the loop, and reports span P/R/F1 with the same
exact-match discipline as conll.span_prf — so numbers here transfer 1:1
to the Spark eval queries. Usage:

  python tools/exp_quality.py baseline            # reproduce round-2 nums
  python tools/exp_quality.py confusion dnrti     # per-etype error table
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ner4cti_spark.kernel import perceptron
from ner4cti_spark.kernel.labels import LabelSpace
from ner4cti_spark.training import ARTIFACT_DIR, CORPORA, DNRTI_TYPES

# engine CTI classes ← DNRTI native types (operators/conll.DNRTI_TO_ETYPE)
from ner4cti_spark.operators.conll import DNRTI_TO_ETYPE  # noqa: E402


def read_conll_py(path: str) -> list[tuple[list[str], list[str]]]:
    """Pure-python twin of conll.read_conll: same line splitting, same
    malformed-line drops, same blank-line sentence assembly."""
    with open(path, encoding="utf-8", errors="replace") as f:
        content = f.read()
    sents: list[tuple[list[str], list[str]]] = []
    toks: list[str] = []
    tags: list[str] = []
    for line in re.split(r"\r\n|\r|\n", content):
        line = line.strip()
        if not line:
            if toks:
                sents.append((toks, tags))
                toks, tags = [], []
            continue
        parts = re.split(r"\s+", line)
        if len(parts) != 2:
            continue
        toks.append(parts[0])
        tags.append(parts[1])
    if toks:
        sents.append((toks, tags))
    return sents


def map_dnrti(tags: list[str]) -> list[str]:
    out = []
    for t in tags:
        if t[:2] in ("B-", "I-"):
            e = DNRTI_TO_ETYPE.get(t[2:])
            out.append(t[:2] + e if e else "O")
        else:
            out.append("O")
    return out


def spans_of(tags: list[str]) -> set[tuple[int, int, str]]:
    """Exact spans, same start discipline as conll.extract_span_rows:
    B- starts; I- starts unless the previous token continues the type."""
    out = set()
    b = None
    et = None
    for i, t in enumerate(tags):
        if t[:2] in ("B-", "I-"):
            e = t[2:]
            if t.startswith("B-") or e != et or b is None:
                if b is not None:
                    out.add((b, i, et))
                b, et = i, e
        else:
            if b is not None:
                out.add((b, i, et))
            b, et = None, None
    if b is not None:
        out.add((b, len(tags), et))
    return out


def span_prf(pred: list[list[str]], gold: list[list[str]]):
    tp = np_ = ng = 0
    for p, g in zip(pred, gold):
        ps, gs = spans_of(p), spans_of(g)
        tp += len(ps & gs)
        np_ += len(ps)
        ng += len(gs)
    prec = tp / np_ if np_ else 0.0
    rec = tp / ng if ng else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return prec, rec, f1, tp, np_, ng


def load_corpus(corpus: str):
    cfg = CORPORA[corpus]
    train = read_conll_py(os.path.join(cfg["path"], "train.txt"))
    vp = os.path.join(cfg["path"], "valid.txt")
    valid = read_conll_py(vp) if os.path.exists(vp) else []
    test = read_conll_py(os.path.join(cfg["path"], "test.txt"))
    return train, valid, test


def load_artifact_bits(corpus: str):
    arts, lex, etypes = perceptron.load_artifact(
        os.path.join(ARTIFACT_DIR, f"{corpus}_crf.npz")
    )
    return arts, lex, etypes


def eval_decode(arts, ls, lex, use_patterns, test, *, map_cti: bool,
                clusters=None):
    pred = perceptron.decode_sents(
        [t for t, _ in test], arts, ls, lex, use_patterns, clusters
    )
    gold = [g for _, g in test]
    if map_cti:
        pred = [map_dnrti(p) for p in pred]
        gold = [map_dnrti(g) for g in gold]
    return span_prf(pred, gold), pred, gold


def baseline():
    for corpus in ("dnrti", "malwaredb"):
        cfg = CORPORA[corpus]
        arts, lex, _ = load_artifact_bits(corpus)
        ls = LabelSpace(cfg["etypes"])
        _, _, test = load_corpus(corpus)
        (p, r, f1, tp, np_, ng), _, _ = eval_decode(
            arts, ls, lex, cfg["use_patterns"], test,
            map_cti=(corpus == "dnrti"), clusters=arts.get("_sp_clusters"),
        )
        print(f"{corpus}: P={p:.4f} R={r:.4f} F1={f1:.4f} (tp={tp} pred={np_} gold={ng})")


def confusion(corpus: str):
    cfg = CORPORA[corpus]
    arts, lex, _ = load_artifact_bits(corpus)
    ls = LabelSpace(cfg["etypes"])
    _, _, test = load_corpus(corpus)
    (_p, _r, _f1, *_), pred, gold = eval_decode(
        arts, ls, lex, cfg["use_patterns"], test,
        map_cti=(corpus == "dnrti"), clusters=arts.get("_sp_clusters"),
    )
    from collections import Counter

    per = Counter()
    for p, g in zip(pred, gold):
        ps, gs = spans_of(p), spans_of(g)
        for s in gs:
            per[(s[2], "gold")] += 1
            if s in ps:
                per[(s[2], "tp")] += 1
        for s in ps:
            per[(s[2], "pred")] += 1
            # boundary-or-type analysis for false positives
            if s not in gs:
                if any(not (s[1] <= g0 or g1 <= s[0]) for g0, g1, _ in gs):
                    per[(s[2], "fp_overlap")] += 1
                else:
                    per[(s[2], "fp_clean")] += 1
    etypes = sorted({k[0] for k in per})
    print(f"{'etype':<12} {'gold':>5} {'pred':>5} {'tp':>5} {'P':>6} {'R':>6} "
          f"{'F1':>6} {'fp_ovl':>6} {'fp_cln':>6}")
    for e in etypes:
        g, pr, tp = per[(e, "gold")], per[(e, "pred")], per[(e, "tp")]
        p_ = tp / pr if pr else 0
        r_ = tp / g if g else 0
        f_ = 2 * p_ * r_ / (p_ + r_) if p_ + r_ else 0
        print(f"{e:<12} {g:>5} {pr:>5} {tp:>5} {p_:>6.3f} {r_:>6.3f} {f_:>6.3f} "
              f"{per[(e, 'fp_overlap')]:>6} {per[(e, 'fp_clean')]:>6}")
    # sentence-level: how much recall is lost in sentences with NO pred?
    n_attr = n_attr_hit = 0
    miss_g = 0
    for p, g in zip(pred, gold):
        gs = spans_of(g)
        if gs:
            n_attr += 1
            if spans_of(p):
                n_attr_hit += 1
            else:
                miss_g += len(gs)
    print(f"\nattributed sentences: {n_attr}; with ≥1 prediction: {n_attr_hit}; "
          f"gold spans in all-O-predicted sentences: {miss_g}")


def _attr(sents):
    return [(t, g) for t, g in sents if any(x != "O" for x in g)]


def twopass():
    """MalwareDB two-pass: sentence-attribution classifier gating a token
    tagger trained on attributed sentences only. Prints the combo grid."""
    import zlib

    cfg = CORPORA["malwaredb"]
    ls = LabelSpace(cfg["etypes"])
    train, valid, test = load_corpus("malwaredb")
    arts0, lex, _ = load_artifact_bits("malwaredb")
    clusters = arts0.get("_sp_clusters")
    tv = train + valid

    # ---------------- sentence classifier (binary averaged perceptron)
    B = 1 << 18
    max_phrase = max((len(k) for k in lex), default=1)

    def clf_feats(tokens):
        lows = [t.lower() for t in tokens]
        lt = perceptron.lexicon_bio(tokens, lex, max_phrase)
        fs = ["b"]
        fs += ["w=" + w for w in set(lows)]
        fs += ["bg=" + a + "_" + b for a, b in zip(lows, lows[1:])]
        fs += ["lex=" + e for e in sorted({t[2:] for t in lt if t != "O"})]
        fs.append("nlex=%d" % min(sum(t.startswith("B-") for t in lt), 5))
        fs.append("len=%d" % min(len(tokens) // 5, 8))
        fs += ["sh=" + perceptron._shape(t) for t in set(tokens)]
        return np.array([zlib.crc32(f.encode()) % B for f in fs], dtype=np.int64)

    def train_clf(data, epochs=12, seed=7):
        w = np.zeros(B, dtype=np.float64)
        wa = np.zeros(B, dtype=np.float64)
        rng = np.random.default_rng(seed)
        feats = [(clf_feats(t), 1.0 if any(x != "O" for x in g) else -1.0)
                 for t, g in data]
        t_step = 0
        for _ in range(epochs):
            for i in rng.permutation(len(feats)):
                f, y = feats[i]
                t_step += 1
                if y * w[f].sum() <= 0:
                    w[f] += y
                    wa[f] += y * t_step
        return w - wa / max(t_step, 1)

    wclf = train_clf(tv)

    def gate(tokens, margin=0.0):
        return wclf[clf_feats(tokens)].sum() > margin

    g_pred = [gate(t) for t, _ in test]
    g_gold = [any(x != "O" for x in g) for _, g in test]
    tp = sum(1 for p, g in zip(g_pred, g_gold) if p and g)
    print("clf: P=%.3f R=%.3f (pred %d, gold %d)"
          % (tp / max(sum(g_pred), 1), tp / max(sum(g_gold), 1),
             sum(g_pred), sum(g_gold)))

    # ---------------- token model trained on ATTRIBUTED sentences only
    attr_arts = perceptron.train_crf(
        _attr(tv), ls, lex, epochs=cfg["epochs"], use_patterns=cfg["use_patterns"],
        cost=cfg["cost"], miss_cost=cfg["miss_cost"], clusters=clusters,
    )
    attr_arts["_sp_clusters"] = clusters

    gold = [g for _, g in test]
    toks = [t for t, _ in test]

    def decode_with(arts, mask=None):
        idx = [i for i in range(len(toks)) if mask is None or mask[i]]
        dec = perceptron.decode_sents([toks[i] for i in idx], arts, ls, lex,
                                      cfg["use_patterns"], clusters)
        out = [["O"] * len(t) for t in toks]
        for j, i in enumerate(idx):
            out[i] = dec[j]
        return out

    base_pred = decode_with(arts0)
    combos = {
        "baseline (r2 artifact)": base_pred,
        "gate x base model": [p if g else ["O"] * len(p)
                              for p, g in zip(base_pred, g_pred)],
        "attr-trained, no gate": decode_with(attr_arts),
        "gate x attr-trained": decode_with(attr_arts, mask=g_pred),
    }
    for name, pred in combos.items():
        p, r, f1, tp, np_, ng = span_prf(pred, gold)
        print(f"{name:<26} P={p:.4f} R={r:.4f} F1={f1:.4f} (pred={np_})")


def twopass2():
    """Honest hyperparameter protocol: fit on train, tune margin/combo on
    valid, refit on train+valid with frozen choices, report test."""
    import zlib

    from ner4cti_spark.kernel import pos as POS

    cfg = CORPORA["malwaredb"]
    ls = LabelSpace(cfg["etypes"])
    train, valid, test = load_corpus("malwaredb")
    arts0, lex, _ = load_artifact_bits("malwaredb")
    clusters = arts0.get("_sp_clusters")

    B = 1 << 18
    max_phrase = max((len(k) for k in lex), default=1)

    def clf_feats(tokens):
        lows = [t.lower() for t in tokens]
        lt = perceptron.lexicon_bio(tokens, lex, max_phrase)
        up = [POS.upos(t) for t in tokens]
        fs = ["b"]
        fs += ["w=" + w for w in set(lows)]
        fs += ["bg=" + a + "_" + b for a, b in zip(lows, lows[1:])]
        fs += ["lex=" + e for e in sorted({t[2:] for t in lt if t != "O"})]
        fs.append("nlex=%d" % min(sum(t.startswith("B-") for t in lt), 5))
        fs.append("len=%d" % min(len(tokens) // 5, 8))
        fs += ["sh=" + perceptron._shape(t) for t in set(tokens)]
        fs += ["up=" + u for u in set(up)]
        fs.append("nv=%d" % min(sum(1 for u in up if u == "VERB"), 5))
        if clusters:
            cl = [clusters.get(w) for w in lows]
            fs += ["c=%s" % c[0] for c in cl if c]
            fs += ["C=%s" % c[1] for c in cl if c]
        fs += ["dw=" + perceptron._digit_norm(w) for w in set(lows)]
        return np.unique(
            np.array([zlib.crc32(f.encode()) % B for f in fs], dtype=np.int64)
        )

    def train_clf(data, epochs=15, seed=7, tau=1.0, pos_w=2.0):
        """Margin perceptron with asymmetric update weight on positives
        (recall matters more downstream)."""
        w = np.zeros(B, dtype=np.float64)
        wa = np.zeros(B, dtype=np.float64)
        rng = np.random.default_rng(seed)
        feats = [(clf_feats(t), 1.0 if any(x != "O" for x in g) else -1.0)
                 for t, g in data]
        t_step = 0
        for _ in range(epochs):
            for i in rng.permutation(len(feats)):
                f, y = feats[i]
                t_step += 1
                if y * w[f].sum() < tau:
                    step = y * (pos_w if y > 0 else 1.0)
                    w[f] += step
                    wa[f] += step * t_step
        return w - wa / max(t_step, 1)

    def fit_stage(fit_data):
        wclf = train_clf(fit_data)
        attr_arts = perceptron.train_crf(
            _attr(fit_data), ls, lex, epochs=cfg["epochs"],
            use_patterns=cfg["use_patterns"], cost=cfg["cost"],
            miss_cost=cfg["miss_cost"], clusters=clusters,
        )
        base_arts = perceptron.train_crf(
            fit_data, ls, lex, epochs=cfg["epochs"],
            use_patterns=cfg["use_patterns"], cost=cfg["cost"],
            miss_cost=cfg["miss_cost"], clusters=clusters,
        )
        return wclf, attr_arts, base_arts

    def eval_combos(wclf, attr_arts, base_arts, ev, label):
        toks = [t for t, _ in ev]
        gold = [g for _, g in ev]
        scores = [wclf[clf_feats(t)].sum() for t in toks]

        def decode_with(arts, mask=None):
            idx = [i for i in range(len(toks)) if mask is None or mask[i]]
            dec = perceptron.decode_sents([toks[i] for i in idx], arts, ls,
                                          lex, cfg["use_patterns"], clusters)
            out = [["O"] * len(t) for t in toks]
            for j, i in enumerate(idx):
                out[i] = dec[j]
            return out

        base_pred = decode_with(base_arts)
        results = {}
        for margin in (-2.0, -1.0, 0.0, 1.0):
            mask = [s > margin for s in scores]
            ap = decode_with(attr_arts, mask=mask)
            results[f"gate({margin:+.0f}) x attr"] = ap
            results[f"gate({margin:+.0f}) x attr UNION base"] = [
                a if any(x != "O" for x in a) else b
                for a, b in zip(ap, base_pred)
            ]
        results["base only"] = base_pred
        print(f"--- {label}")
        best = None
        for name, pred in results.items():
            p, r, f1, tp, np_, ng = span_prf(pred, gold)
            print(f"{name:<30} P={p:.4f} R={r:.4f} F1={f1:.4f} (pred={np_})")
            if best is None or f1 > best[1]:
                best = (name, f1)
        print("best:", best)
        return best[0]

    # tune on valid with train-fitted models
    wclf, attr_arts, base_arts = fit_stage(train)
    eval_combos(wclf, attr_arts, base_arts, valid, "valid (train-fitted)")
    # refit on train+valid, report test for ALL combos (choice frozen from valid)
    wclf, attr_arts, base_arts = fit_stage(train + valid)
    eval_combos(wclf, attr_arts, base_arts, test, "test (tv-fitted)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    if cmd == "baseline":
        baseline()
    elif cmd == "confusion":
        confusion(sys.argv[2])
    elif cmd == "twopass":
        twopass()
    elif cmd == "twopass2":
        twopass2()
