"""Rule-based UPOS tagger — the F4 feature signal (SURVEY §2).

The reference derives a 10-dim POS feature from stanza UPOS tags
(data_utils.py:46-62); stanza is not in this environment, so the engine
ships a deterministic closed-class + suffix heuristic over the same
17-tag UPOS inventory. It is a pure token→tag function (no context),
which is exactly how the reference consumes POS too — as a per-token
embedding lookup, not a sequence model.

Accuracy of the heuristic itself is secondary: it feeds (a) the pos
embedding row in the neural branch and (b) discrete features in the
trained CRF (kernel/perceptron.py), where the learner weights it.
"""

from __future__ import annotations

UPOS = [
    "ADJ", "ADP", "ADV", "AUX", "CCONJ", "DET", "INTJ", "NOUN", "NUM",
    "PART", "PRON", "PROPN", "PUNCT", "SCONJ", "SYM", "VERB", "X", "[PAD]",
]
UPOS2ID = {t: i for i, t in enumerate(UPOS)}
N_UPOS = len(UPOS)

_DET = {"the", "a", "an", "this", "that", "these", "those", "each", "every",
        "some", "any", "no", "another", "such", "both", "all"}
_ADP = {"of", "in", "on", "at", "by", "with", "from", "into", "onto", "over",
        "under", "between", "through", "during", "against", "within",
        "without", "via", "per", "across", "toward", "towards", "upon",
        "about", "after", "before", "since", "until", "among", "behind",
        "beyond", "inside", "outside", "near", "off", "around", "to"}
_PRON = {"i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
         "us", "them", "its", "his", "their", "our", "your", "my", "mine",
         "yours", "theirs", "ours", "itself", "himself", "herself",
         "themselves", "who", "whom", "whose", "which", "what", "something",
         "anything", "nothing", "everything", "someone", "anyone", "one"}
_CCONJ = {"and", "or", "but", "nor", "yet", "plus"}
_SCONJ = {"if", "because", "while", "although", "though", "whereas",
          "unless", "whether", "once", "when", "whenever", "where", "as",
          "that", "so"}
_AUX = {"is", "are", "was", "were", "be", "been", "being", "am", "has",
        "have", "had", "having", "will", "would", "can", "could", "may",
        "might", "must", "shall", "should", "do", "does", "did", "done"}
_ADV = {"not", "n't", "also", "very", "often", "never", "always", "still",
        "already", "again", "then", "there", "here", "however", "thus",
        "therefore", "later", "earlier", "first", "recently", "typically",
        "largely", "likely", "only", "just", "well", "further", "instead"}
_PART = {"'s", "’s", "na", "nt"}
_INTJ = {"yes", "no?", "oh", "hey", "please"}

_ADJ_SUF = ("ous", "ive", "able", "ible", "ful", "less", "ish", "ary",
            "ian", "ical", "ar", "ile", "ant", "ent")
_NOUN_SUF = ("tion", "sion", "ment", "ness", "ity", "ism", "ance", "ence",
             "ship", "hood", "ware", "ness", "age", "ery")
_VERB_SUF = ("ize", "ise", "ify", "ate", "en")


def upos(tok: str) -> str:
    """Token → UPOS tag (deterministic heuristic; see module docstring)."""
    if not tok:
        return "[PAD]"
    lw = tok.lower()
    if all(not c.isalnum() for c in tok):
        return "SYM" if any(c in "$%+=<>|^~#&*@" for c in tok) else "PUNCT"
    n_digits = sum(c.isdigit() for c in tok)
    if tok.isdigit() or n_digits / len(tok) > 0.5:
        return "NUM"
    if lw in _DET:
        return "DET"
    if lw in _ADP:
        return "ADP"
    if lw in _PRON:
        return "PRON"
    if lw in _CCONJ:
        return "CCONJ"
    if lw in _SCONJ:
        return "SCONJ"
    if lw in _AUX:
        return "AUX"
    if lw in _ADV or (lw.endswith("ly") and len(lw) > 4):
        return "ADV"
    if lw in _PART:
        return "PART"
    if lw in _INTJ:
        return "INTJ"
    if n_digits > 0 or not tok.isalpha():
        return "X"  # mixed identifiers: CVE-2017-0144, file paths, hashes
    if tok[0].isupper():
        return "PROPN"
    if lw.endswith(("ing", "ed")) and len(lw) > 4:
        return "VERB"
    if lw.endswith(_VERB_SUF) and len(lw) > 4:
        return "VERB"
    if lw.endswith(_ADJ_SUF) and len(lw) > 4:
        return "ADJ"
    if lw.endswith(_NOUN_SUF) and len(lw) > 5:
        return "NOUN"
    return "NOUN"


def upos_id(tok: str) -> int:
    return UPOS2ID[upos(tok)]


# ---------------------------------------------------------------- SQL form

_ALNUM = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
_LOWER = "abcdefghijklmnopqrstuvwxyz"
_SYMCH = "$%+=<>|^~#&*@"


def _sql_in(expr: str, words: set[str]) -> str:
    lits = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))
    return f"{expr} IN ({lits})"


def _sql_suffix(expr: str, sufs: tuple[str, ...]) -> str:
    return "(" + " OR ".join(f"{expr} LIKE '%{s}'" for s in sufs) + ")"


def upos_case_sql(tok: str = "word") -> str:
    """`upos()` as one ANSI-SQL CASE expression over column `tok`.

    Generated from the SAME closed-class sets and suffix lists upos()
    uses, preserving its branch order, so there is a single source of
    truth. The string runs verbatim in Spark SQL (JVM-side, whole-stage
    codegen — the corpus-scale POS mapping never enters Python) and in
    DuckDB (the correctness oracle). Character-class tests use
    translate() with explicit ASCII alphabets instead of Python's
    unicode-aware str methods — identical on ASCII tokens (tested in
    tests/test_pos_sql.py); non-ASCII letters fall to PUNCT/X here
    where upos() may say NOUN. Integer arithmetic only: the digit-ratio
    test n/len > 0.5 is expressed as 2*n > len, exact for ints.
    """
    lw = f"lower({tok})"
    ln = f"length({tok})"
    nd = f"({ln} - length(translate({tok}, '0123456789', '')))"
    all_nonalnum = f"length(translate({tok}, '{_ALNUM}', '')) = {ln}"
    has_sym = f"length(translate({tok}, '{_SYMCH}', '')) < {ln}"
    non_alpha = f"length(translate({lw}, '{_LOWER}', '')) > 0"
    first_upper = f"ascii({tok}) BETWEEN 65 AND 90"
    branches = [
        (f"{tok} IS NULL OR {ln} = 0", "'[PAD]'"),
        (all_nonalnum, f"(CASE WHEN {has_sym} THEN 'SYM' ELSE 'PUNCT' END)"),
        (f"{nd} * 2 > {ln}", "'NUM'"),
        (_sql_in(lw, _DET), "'DET'"),
        (_sql_in(lw, _ADP), "'ADP'"),
        (_sql_in(lw, _PRON), "'PRON'"),
        (_sql_in(lw, _CCONJ), "'CCONJ'"),
        (_sql_in(lw, _SCONJ), "'SCONJ'"),
        (_sql_in(lw, _AUX), "'AUX'"),
        (f"{_sql_in(lw, _ADV)} OR ({lw} LIKE '%ly' AND {ln} > 4)", "'ADV'"),
        (_sql_in(lw, _PART), "'PART'"),
        (_sql_in(lw, _INTJ), "'INTJ'"),
        (f"{nd} > 0 OR {non_alpha}", "'X'"),
        (first_upper, "'PROPN'"),
        (f"({lw} LIKE '%ing' OR {lw} LIKE '%ed') AND {ln} > 4", "'VERB'"),
        (f"{_sql_suffix(lw, _VERB_SUF)} AND {ln} > 4", "'VERB'"),
        (f"{_sql_suffix(lw, _ADJ_SUF)} AND {ln} > 4", "'ADJ'"),
        (f"{_sql_suffix(lw, _NOUN_SUF)} AND {ln} > 5", "'NOUN'"),
    ]
    whens = " ".join(f"WHEN {c} THEN {v}" for c, v in branches)
    return f"(CASE {whens} ELSE 'NOUN' END)"
