"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema per the input contract: (repo, path, commit, lang, content).
Content is seeded synthetic source code: zipfian identifier vocabulary +
language keywords + operators + literals + analyzer edge cases
(snake_case, camelCase, ALLCAPS, digits, dotted names, hyphens, unicode,
empty/whitespace-only docs). Long-tail doc lengths (20-4000 tokens).
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd

LANGS = ["python", "java", "js", "go", "c", "md"]
LANG_W = [0.3, 0.2, 0.2, 0.1, 0.1, 0.1]
EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "c": "c", "md": "md"}

KEYWORDS = {
    "python": ["def", "return", "import", "class", "for", "in", "range", "if",
               "else", "self", "None", "True", "yield", "lambda", "print"],
    "java": ["public", "static", "void", "main", "class", "interface", "return",
             "new", "int", "String", "final", "extends", "implements"],
    "js": ["function", "const", "let", "var", "return", "async", "await",
           "export", "import", "class", "this"],
    "go": ["func", "package", "import", "return", "defer", "go", "chan",
           "struct", "interface", "range"],
    "c": ["int", "void", "return", "struct", "static", "const", "char",
          "sizeof", "typedef", "include"],
    "md": ["the", "a", "and", "of", "to", "in", "for", "with", "code",
           "example", "usage", "install"],
}

EDGE_TOKENS = [
    "snake_case_name", "camelCaseName", "ALLCAPS", "x86_64", "v2", "a.b.c",
    "foo-bar", "πvar", "naïve", "i18n", "utf8", "self.value", "std::vector",
    "1e-5", "3.14",
]

OPERATORS = ["=", "==", "+", "-", "(", ")", "{", "}", "[", "]", ";", ",",
             "->", "=>", "&&", "||", "!", "*", "/"]


def _vocab(n: int = 50_000) -> List[str]:
    rng = np.random.default_rng(4242)
    syll = ["data", "load", "parse", "node", "tree", "hash", "map", "list",
            "str", "buf", "ctx", "cfg", "util", "calc", "proc", "idx", "tmp",
            "val", "key", "ptr", "arr", "obj", "req", "res", "mod", "gen"]
    out = []
    for i in range(n):
        k = 1 + int(rng.integers(0, 3))
        parts = [syll[int(rng.integers(0, len(syll)))] for _ in range(k)]
        style = int(rng.integers(0, 3))
        if style == 0:
            out.append("_".join(parts) + (str(i % 100) if i % 7 == 0 else ""))
        elif style == 1:
            out.append(parts[0] + "".join(p.capitalize() for p in parts[1:]))
        else:
            out.append("".join(parts) + str(i % 1000))
    return out


_VOCAB = None


def generate_corpus(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic corpus of ``n_docs`` rows."""
    global _VOCAB
    if _VOCAB is None:
        _VOCAB = _vocab()
    vocab = _VOCAB
    rng = np.random.default_rng(seed)
    # zipfian vocab sampling
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    langs = rng.choice(len(LANGS), size=n_docs, p=LANG_W)
    # long-tail doc lengths
    lens = np.minimum((rng.pareto(1.6, n_docs) + 1.0) * 18, 4000).astype(np.int64)
    lens = np.maximum(lens, 3)

    # vectorized token sampling: one global draw for all docs' tokens
    total = int(lens.sum())
    cat = rng.random(total)
    vocab_ids = rng.choice(len(vocab), size=total, p=probs)
    kw_ids = rng.integers(0, 1 << 30, size=total)
    edge_ids = rng.integers(0, len(EDGE_TOKENS), size=total)
    op_ids = rng.integers(0, len(OPERATORS), size=total)
    num_vals = rng.integers(0, 10000, size=total)

    vocab_np = np.array(vocab, dtype=object)
    edge_np = np.array(EDGE_TOKENS, dtype=object)
    op_np = np.array(OPERATORS, dtype=object)

    offsets = np.concatenate(([0], np.cumsum(lens)))
    rows = []
    for i in range(n_docs):
        lang = LANGS[int(langs[i])]
        if i % 211 == 0:
            content = ""  # empty docs exercise zero-length handling
        elif i % 211 == 105:
            content = "   \n\t  "
        else:
            s, e = int(offsets[i]), int(offsets[i + 1])
            kw = KEYWORDS[lang]
            c = cat[s:e]
            toks = np.where(
                c < 0.35,
                np.array(kw, dtype=object)[kw_ids[s:e] % len(kw)],
                np.where(
                    c < 0.40,
                    edge_np[edge_ids[s:e]],
                    np.where(
                        c < 0.47,
                        op_np[op_ids[s:e]],
                        np.where(
                            c < 0.52,
                            num_vals[s:e].astype(str).astype(object),
                            vocab_np[vocab_ids[s:e]],
                        ),
                    ),
                ),
            )
            content = " ".join(toks.tolist())
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        rows.append(
            (
                f"org{i % 97}/repo{i % 389}",
                f"src/pkg{i % 23}/mod{i % 7}/file_{i}.{EXT[lang]}",
                commit,
                lang,
                content,
            )
        )
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
