"""make_synthetic CLI: generate a CORD-19-shaped synthetic corpus on disk.

No real CORD-19 data ships with this environment, so the eval configs
(BASELINE.md) run against a synthetic corpus with a Zipf vocabulary and
CORD-19 file layout: metadata.csv + document_parses/pmc_json/*.xml.json with
title/abstract/body_text sections. The same tool feeds the offline build
pipeline (forwardindex -> lexicon) and the benchmark harness.

Usage: python -m nextsearch_tpu.tools.make_synthetic OUT_DIR \
    [--n 5000] [--vocab 20000] [--seed 0] [--avg_len 120]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

# A tiny real-word stem list keeps queries human-typable; the tail is wNNNNN.
_STEMS = (
    "covid corona virus vaccine immunity antibody protein cell lung "
    "infection transmission mutation variant genome sequence patient "
    "clinical trial efficacy symptom fever respiratory pandemic epidemic "
    "mask distancing quarantine antiviral treatment therapy dose response "
    "pcr test antigen spike receptor binding enzyme inhibitor pathway "
).split()


def vocab_words(vocab: int):
    words = list(_STEMS[:vocab])
    for i in range(len(words), vocab):
        words.append(f"w{i:05d}")
    return words


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="make_synthetic")
    p.add_argument("out_dir")
    p.add_argument("--n", type=int, default=5000)
    p.add_argument("--vocab", type=int, default=20000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--avg_len", type=int, default=120)
    args = p.parse_args(argv)

    out = Path(args.out_dir)
    parses = out / "document_parses" / "pmc_json"
    parses.mkdir(parents=True, exist_ok=True)

    r = np.random.default_rng(args.seed)
    words = vocab_words(args.vocab)
    probs = 1.0 / np.arange(1, args.vocab + 1) ** 1.07
    probs /= probs.sum()

    meta_lines = [
        "cord_uid,title,authors,publish_time,url,abstract,"
        "pdf_json_files,pmc_json_files"
    ]
    for i in range(args.n):
        uid = f"syn{i:07d}"
        length = max(5, int(r.poisson(args.avg_len)))
        toks = r.choice(args.vocab, size=length, p=probs)
        body = " ".join(words[t] for t in toks)
        title_toks = r.choice(args.vocab, size=4, p=probs)
        title = " ".join(words[t] for t in title_toks)
        rel = f"document_parses/pmc_json/{uid}.xml.json"
        doc = {
            "paper_id": uid,
            "title": title,
            "abstract": [{"text": body[: len(body) // 3]}],
            "body_text": [{"text": body}],
        }
        (out / rel).write_text(json.dumps(doc))
        year = 2019 + int(r.integers(0, 3))
        meta_lines.append(
            f'{uid},"{title}","Author{i % 97}, A; Coauthor, B",'
            f"{year}-01-{1 + i % 28:02d},https://example.org/{uid};mirror,"
            f'"{body[:80]}",,{rel}'
        )
        if (i + 1) % 2000 == 0:
            print(f"docs: {i + 1}", file=sys.stderr)

    (out / "metadata.csv").write_text("\n".join(meta_lines) + "\n")
    print(f"Synthetic corpus: {args.n} docs in {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
