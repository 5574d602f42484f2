"""Deterministic test fixtures (FIXTURES.md).

All generators are seeded and order-stable; corpus order (= docid order) is
lexicographic (repo, path, commit). The same rows, rendered to TREC XML in
the same order, feed the reference oracle.
"""

from __future__ import annotations

import hashlib
import random

NUMBER_WORDS = ["ten", "nine", "eight", "seven", "six", "five",
                "four", "three", "two", "one"]


def golden_docs() -> list[tuple[str, str]]:
    """The reference 11-doc corpus (test_documents.xml:1-11) as rows.

    docno "0" content "zero"; docno i (1..10) = first i number words.
    Golden outputs: tests/10_search.bats:3-90 (byte-exact incl. scores).
    """
    docs = [("0", "zero")]
    for i in range(1, 11):
        docs.append((str(i), " ".join(NUMBER_WORDS[:i])))
    return docs


GOLDEN_EXPECTED = {
    "zero": ["0 Q0 0 1 2.7475 JASSjr"],
    "one": ["0 Q0 10 1 2.0802 JASSjr"],
    "two": ["0 Q0 9 1 1.5199 JASSjr", "0 Q0 10 2 1.4789 JASSjr"],
    "three": ["0 Q0 8 1 1.1915 JASSjr", "0 Q0 9 2 1.1584 JASSjr",
              "0 Q0 10 3 1.1272 JASSjr"],
    "ten": ["0 Q0 1 1 0.1092 JASSjr", "0 Q0 2 2 0.1054 JASSjr",
            "0 Q0 3 3 0.1019 JASSjr", "0 Q0 4 4 0.0987 JASSjr",
            "0 Q0 5 5 0.0956 JASSjr", "0 Q0 6 6 0.0927 JASSjr",
            "0 Q0 7 7 0.0900 JASSjr", "0 Q0 8 8 0.0874 JASSjr",
            "0 Q0 9 9 0.0850 JASSjr", "0 Q0 10 10 0.0827 JASSjr"],
}

# Source-code-ish token mix per FIXTURES.md §1: stopword-like high-df tokens
# (skew + df==N elision), hyphenated, uppercase, numeric, one >255-char token.
_COMMON = ["the", "if", "0", "return", "def", "import", "for", "in", "x"]
_MID = ["parser", "index", "Spark", "shuffle", "postings", "Tokenize",
        "bm25", "query-plan", "doc-id", "varbyte", "wand", "arrow",
        "lineage", "checkpoint", "metrics", "batch", "couch-2-5k"]
_RARE = [f"sym{i:04d}" for i in range(400)]
_LONG_TOKEN = "L" + "o" * 300 + "ng"  # truncated to 255 by the engine AND ref


def synth_docs(n_docs: int, seed: int = 42) -> list[tuple[str, str, str, str, str]]:
    """-> [(repo, path, commit, lang, content)] sorted by (repo, path, commit)."""
    rng = random.Random(seed)
    rows = []
    langs = ["py", "c", "java", "go", "rs"]
    for i in range(n_docs):
        repo = f"repo{i % 37:04d}"
        path = f"src/mod{i % 11}/file{i}.py"
        commit = hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:8]
        lang = langs[i % len(langs)]
        n_tokens = rng.randint(3, 120)
        words = []
        for _ in range(n_tokens):
            r = rng.random()
            if r < 0.45:
                words.append(rng.choice(_COMMON))
            elif r < 0.8:
                words.append(rng.choice(_MID))
            else:
                words.append(rng.choice(_RARE))
        if i % 97 == 0:
            words.append(_LONG_TOKEN)
        rows.append((repo, path, commit, lang, " ".join(words)))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    return rows


def docno_of(repo: str, path: str, commit: str) -> str:
    """Primary key matching [a-zA-Z0-9][a-zA-Z0-9-]* (FIXTURES.md §1)."""
    flat = f"{repo}-{path}-{commit}".replace("/", "-").replace(".", "-")
    return flat.upper()


def synth_queries(n: int, seed: int = 42) -> list[str]:
    """TREC-style query lines; includes out-of-vocab + duplicate terms and
    one id-less line (query_id defaults to 0)."""
    rng = random.Random(seed + 1)
    vocab = _COMMON + _MID + _RARE[:50] + ["notinvocab", "missing-term"]
    lines = []
    for qid in range(51, 51 + n):
        k = rng.randint(1, 5)
        terms = [rng.choice(vocab).lower() for _ in range(k)]
        if rng.random() < 0.15:
            terms.append(terms[0])  # duplicate term: bag semantics
        lines.append(f"{qid} " + " ".join(terms))
    lines.append("the shuffle postings")  # no leading id -> qid 0
    return lines


def tiebreak_docs() -> list[tuple[str, str]]:
    """Duplicate documents -> equal BM25 scores -> asserts docid-DESC ties
    (SURVEY.md §1.4 item 6). docnos share a token so lengths stay equal."""
    docs = []
    for i in range(8):
        docs.append((f"DUP-{i}", "alpha beta beta gamma"))
    docs.append(("DUP-8", "alpha unique1"))
    docs.append(("DUP-9", "delta unique2"))
    return docs
