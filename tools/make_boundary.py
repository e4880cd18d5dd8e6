#!/usr/bin/env python3
"""Adversarial containment-boundary fixture (r12 verdict #4).

The r12 recall census measured 1.0000 for d40b/d44 at every knob —
the organic fixture's pairs are wide-margin, so the gates' failure
modes were never exercised. This derives a documents.parquet whose
planted pairs sit AT the decision boundary:

  even-size regime (estimate-noise failure mode): doc A (200 shingles)
  shares a contiguous L-token prefix with doc B (300 shingles) such
  that true containment c12 = (L-2)/200 lands exactly on a target in
  {0.51, 0.55, 0.60, 0.70} — just above the exact threshold (0.5), so
  the pair IS truth, while the KMV estimate gate (est_t = 0.4) must
  resolve a margin of only c-0.4 through k-sample noise;

  tiny-in-huge regime (candidate-miss failure mode): doc A (30
  shingles) is a contiguous interior run of doc B (300 or 2000
  shingles) — c12 = 1.0, but the probability that A's bottom-k sketch
  shares an element with B's fades as k·|A|/|B| (the fade the d40
  header documents; here it becomes a measured number).

Construction gives EXACT truth by design: every token is unique to its
(family, config, pair) triple, so shared shingles are exactly the
planted prefix/run and nothing else; filler docs use disjoint vocab.
Families: f=0 plants both docs in one source (d40b's same-source
gate), f=1 plants A in src0 / B in src1 (d44's cross-source gate).

doc_id encodes the config for the census: id = 1_000_000*(f+1) +
cfg*10_000 + 2*pair (+1 for B); graft.RecallBench's boundary mode
derives (family, cfg) back from the id. Filler ids start at 9_000_000.

Dev harness (driver-side python stack), not part of the shipped
library. Usage: python3 tools/make_boundary.py [dst_dir]
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

PAIRS = 50
# cfg -> (label, builder kind, params)
# cfgs 0-3 sit just ABOVE the 0.5 exact threshold (recall probes);
# cfgs 6-8 sit BELOW it (false-positive probes: any pair the estimate
# gate emits from these is wasted verify work / a d40b false positive)
EVEN = [(0, 0.51), (1, 0.55), (2, 0.60), (3, 0.70),  # (cfg, target c12)
        (6, 0.49), (7, 0.45), (8, 0.30)]
TINY = [(4, 300), (5, 2000)]                         # (cfg, B shingles)


def toks(prefix, n):
    return [f"{prefix}t{j}" for j in range(n)]


def main():
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/boundary"
    os.makedirs(dst, exist_ok=True)
    rows = {"doc_id": [], "text": [], "lang": [], "source": []}

    def add(doc_id, words, source):
        rows["doc_id"].append(doc_id)
        rows["text"].append(" ".join(words))
        rows["lang"].append("en")
        rows["source"].append(source)

    for f in (0, 1):
        src_a = "src0"
        src_b = "src0" if f == 0 else "src1"
        for cfg, c in EVEN:
            # A: L shared prefix tokens + unique tail -> 202 tokens,
            # 200 shingles, of which L-2 are shared => c12 = (L-2)/200
            L = round(200 * c) + 2
            for p in range(PAIRS):
                u = f"f{f}c{cfg}p{p}"
                shared = toks(u + "s", L)
                a_words = shared + toks(u + "a", 202 - L)
                b_words = shared + toks(u + "b", 302 - L)
                base = 1_000_000 * (f + 1) + cfg * 10_000 + 2 * p
                add(base, a_words, src_a)
                add(base + 1, b_words, src_b)
        for cfg, bsz in TINY:
            # A = 32-token contiguous INTERIOR run of B -> 30 shingles,
            # every one inside B => c12 = 1.0, ratio sz2/sz1 = bsz/30
            for p in range(PAIRS):
                u = f"f{f}c{cfg}p{p}"
                b_words = toks(u + "b", bsz + 2)
                off = 100 + (p % 50)  # interior, varies per pair
                a_words = b_words[off:off + 32]
                base = 1_000_000 * (f + 1) + cfg * 10_000 + 2 * p
                add(base, a_words, src_a)
                add(base + 1, b_words, src_b)
    # filler: disjoint vocab, both sources — keeps the candidate join
    # honest (index side is not only planted docs)
    for i in range(200):
        add(9_000_000 + i, toks(f"fill{i}", 100), "src0" if i % 2 else "src1")

    t = pa.table({
        "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
        "text": pa.array(rows["text"], type=pa.string()),
        "lang": pa.array(rows["lang"], type=pa.string()),
        "source": pa.array(rows["source"], type=pa.string()),
        "n_chars": pa.array([len(s) for s in rows["text"]], type=pa.int64()),
    })
    pq.write_table(t, os.path.join(dst, "documents.parquet"))
    print(f"{t.num_rows} docs -> {dst}/documents.parquet "
          f"({2 * len(EVEN + TINY)} configs x {PAIRS} pairs + 200 filler)")


if __name__ == "__main__":
    main()
