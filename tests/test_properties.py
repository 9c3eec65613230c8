"""Property-based kernel tests (hypothesis) — SURVEY §5.2.4."""

from __future__ import annotations

import itertools

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ner4cti_spark.kernel.crf import viterbi_decode
from ner4cti_spark.kernel.labels import CTI
from ner4cti_spark.kernel.tagger import TaggerKernel, casing_class, extract_spans
from ner4cti_spark.kernel.weights import build_weights


def _reference_case_oracle(token: str) -> int:
    """Literal transcription of data_utils.py:141-162."""
    case2idx = {"allNum": 0, "allLower": 1, "allUpper": 2, "upperInit": 3,
                "other": 4, "main_num": 5, "contain_num": 6, "[PAD]": 7}
    num_digits = sum(c.isdigit() for c in token.strip())
    digit_prop = num_digits / float(len(token))
    casing = "other"
    if token.isdigit():
        casing = "allNum"
    elif digit_prop > 0.5:
        casing = "main_num"
    elif token.islower():
        casing = "allLower"
    elif token.isupper():
        casing = "allUpper"
    elif token.istitle():
        casing = "upperInit"
    elif num_digits > 0:
        casing = "contain_num"
    return case2idx[casing]


@given(st.text(min_size=1, max_size=20))
@settings(max_examples=300, deadline=None)
def test_casing_class_matches_reference_on_arbitrary_text(tok):
    assert casing_class(tok) == _reference_case_oracle(tok)


@given(
    st.integers(min_value=1, max_value=5),   # T
    st.integers(min_value=2, max_value=4),   # L
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=60, deadline=None)
def test_viterbi_matches_brute_force_randomized(T, L, seed):
    rng = np.random.default_rng(seed)
    em = rng.standard_normal((1, T, L)).astype(np.float32)
    trans = rng.standard_normal((L, L)).astype(np.float32)
    paths, scores = viterbi_decode(em, trans, np.array([T]))
    best, best_score = None, -np.inf
    for path in itertools.product(range(L), repeat=T):
        s = em[0, 0, path[0]] + sum(
            trans[path[t - 1], path[t]] + em[0, t, path[t]] for t in range(1, T)
        )
        if s > best_score:
            best, best_score = list(path), s
    assert list(paths[0, :T]) == best
    assert np.isclose(scores[0], best_score, atol=1e-3)


_tag_strategy = st.lists(
    st.sampled_from(CTI.tags), min_size=1, max_size=12
)


@given(_tag_strategy)
@settings(max_examples=200, deadline=None)
def test_span_extraction_covers_exactly_B_starts(tags):
    toks = [f"t{i}" for i in range(len(tags))]
    spans = extract_spans(toks, tags)
    # each span starts at a B- position with the matching etype
    for b, e, surface, etype in spans:
        assert tags[b] == f"B-{etype}"
        for j in range(b + 1, e):
            assert tags[j] == f"I-{etype}"
        assert surface == " ".join(toks[b:e])
    # number of spans == number of B- tags
    assert len(spans) == sum(t.startswith("B-") for t in tags)
    # spans are disjoint and ordered
    for (b1, e1, *_), (b2, e2, *_) in zip(spans, spans[1:]):
        assert e1 <= b2


@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                                       max_codepoint=0x2FF),
                min_size=1, max_size=10,
            ),
            min_size=1, max_size=12,
        ),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=30, deadline=None)
def test_tagger_total_on_arbitrary_tokens(sents):
    """The kernel must be total and aligned on arbitrary token input."""
    k = TaggerKernel(build_weights())
    tags, scores = k.tag(sents)
    assert [len(t) for t in tags] == [len(s) for s in sents]
    assert all(t in CTI.labels for ts in tags for t in ts)
    assert len(scores) == len(sents)
    # determinism: same input → same output
    tags2, _ = k.tag(sents)
    assert tags == tags2
