#!/usr/bin/env python3
"""Dev tool (driver-side python, not engine code): generate a POWER-LAW
documents table for validating the text-signal operators where their
intended signal actually exists (round-14 verdict ask #3).

The driver's synthetic gate corpus is ~31 near-uniform terms per language —
zipfFit correctly reads slope -0.2..-0.3 / r2 ~ 0.1 on it, `lang` carries no
lexical signal, and WordPiece's first merge is a degenerate full-cohesion
pair. This recipe (public: Zipf-sampled vocabulary, per-language DISJOINT
vocab slices) produces text where the operators' signals are real:

 - rank-r word probability proportional to 1/r^s (s=1.0 default) per language
 - each language spells its words from its own 6-letter alphabet slice
   (disjoint vocabularies: lang is fully text-determined)
 - word spelling = base-6 digits of the rank, left-padded to 3 chars, plus a
   rank-keyed 0..3-char suffix so lengths vary like text

The hermetic Scala twin of this generator lives in ZipfCorpusSpec (same
recipe, independently seeded), where the measured readings are pinned:
slope -0.96..-0.99 / r2 > 0.99 at maxRank=100, linear-classifier loss
1386294 -> ~8 micro, BPE/WordPiece merge overlap 0/10.

Usage: python3 tools/gen_zipf_corpus.py /tmp/zipf_corpus [n_docs_per_lang] [vocab_per_lang]
Writes <out>/documents.parquet with the standard documents schema.
vocab_per_lang (default 500) scales the DISTINCT-WORD relation the
tokenizer trainers operate on — the round-15 verdict ask #5 measures the
trainers at ~50k total distinct words (vocab_per_lang=12500, 4 langs).
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1]
n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 60
V = int(sys.argv[3]) if len(sys.argv) > 3 else 500
S, DOC_LEN, SEED = 1.0, 90, 42
ALPHABETS = ["abcdef", "ghijkl", "mnopqr", "stuvwx"]

os.makedirs(out, exist_ok=True)


def word(alpha, rank):
    base = len(alpha)
    digits, r = [], rank
    while r > 0:
        digits.append(alpha[r % base])
        r //= base
    core = alpha[0] * max(0, 3 - len(digits)) + "".join(reversed(digits))
    h = (rank * 2654435761) % (1 << 64) >> 33
    suffix = "".join(alpha[(h // 4 + j) % base] for j in range(h % 4))
    return core + suffix


w = 1.0 / np.power(np.arange(1, V + 1, dtype=np.float64), S)
p = w / w.sum()
rng = np.random.default_rng(SEED)
rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for li, alpha in enumerate(ALPHABETS):
    vocab = [word(alpha, r) for r in range(V)]
    for d in range(n_docs):
        ranks = rng.choice(V, size=DOC_LEN, p=p)
        text = " ".join(vocab[r] for r in ranks)
        rows["doc_id"].append(li * n_docs + d)
        rows["text"].append(text)
        rows["lang"].append(f"lang{li}")
        rows["source"].append("zipfgen")
        rows["n_chars"].append(len(text))

t = pa.table({
    "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
    "text": pa.array(rows["text"], type=pa.string()),
    "lang": pa.array(rows["lang"], type=pa.string()),
    "source": pa.array(rows["source"], type=pa.string()),
    "n_chars": pa.array(rows["n_chars"], type=pa.int64()),
})
pq.write_table(t, f"{out}/documents.parquet")
print(f"documents: {t.num_rows} rows -> {out}/documents.parquet")
