#!/usr/bin/env python3
"""Derive a DIRTY copy of a testdata scale dir (round-7 verdict item #1).

The driver's synthetic corpus is clean — no duplicate texts, no URLs, no
never-ordered customers, no out-of-order funnels — so the rejection
branches of d01/d14/d26/q36/q46 only ever see empty sets in the oracle
gate. This script copies a scale dir and PLANTS that dirt, preserving
each table's parquet schema exactly, so the EXISTING gate
(graft.Verify + tools/check.py) proves the branches on non-zero rows:

  documents:  exact duplicates of index-bucket texts under batch-bucket
              doc_ids (d26 drop branch), triple copies of fresh texts
              within the batch bucket (d26 n_batch_copies>1, d01
              collapse), URL+email-bearing docs (d14 redaction), and
              near-duplicates (LSH candidate branches)
  customer:   customers that never placed an order (q36 anti-join)
  events:     users whose purchase/click precede any view (q46's
              order-dependence — they must NOT count past step 1)

A manifest of planted ids lands at <dst>/dirty_manifest.json for
tools/check_dirty_branches.py to assert the branches actually fired.

Dev harness (driver-side python stack), not part of the shipped library.
Usage: python3 tools/make_dirty.py [src_sf_dir] [dst_dir]
"""
import hashlib
import json
import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def hash_bucket(doc_id):
    """Must match graft.llm.TextOps.hashBucket / the oracle SQL:
    CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) % 100."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def ids_with_bucket(start, pred, n):
    """First n ids >= start whose hash bucket satisfies pred."""
    out, i = [], start
    while len(out) < n:
        if pred(hash_bucket(i)):
            out.append(i)
        i += 1
    return out, i


def append_rows(src_path, dst_path, new_rows):
    """Append dict-rows to a parquet table, preserving its exact schema."""
    orig = pq.read_table(src_path).replace_schema_metadata(None)
    cols = {name: [r[name] for r in new_rows] for name in orig.schema.names}
    extra = pa.table(cols).select(orig.schema.names).cast(orig.schema)
    pq.write_table(pa.concat_tables([orig, extra]), dst_path)


HH_CAPACITY = 64  # graft.llm.QualityOps.HhCapacity — d21's exact regime


def dirty_documents(src, dst, manifest):
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    docs = t.to_pylist()
    next_id = max(d["doc_id"] for d in docs) + 1
    sources = sorted({d["source"] for d in docs})
    texts = {d["text"] for d in docs}
    # planted text reuses the EXISTING vocabulary (uniqueness comes from
    # word order) + exactly two fixed PII tokens, so every lang stays
    # under d21's Misra-Gries capacity and the sketch stays in its
    # documented EXACT regime (vocab 31 + 2 << capacity 64)
    vocab = sorted({w for d in docs for w in d["text"].lower().split() if w})
    rnd = random.Random(7)
    rows = []

    def doc(doc_id, text, source, lang="en"):
        return {"doc_id": doc_id, "text": text, "lang": lang,
                "source": source, "n_chars": len(text)}

    def fresh_text(n_words=14):
        while True:
            words = [rnd.choice(vocab) for _ in range(n_words)]
            words[0], words[3] = "the", "a"  # quality-gate stopwords
            text = " ".join(words)
            if text not in texts:
                texts.add(text)
                return text

    # (a) d26 drop branch: batch-bucket (>=80) copies of texts whose
    # original doc sits in the index buckets (<80) — the incremental check
    # must drop every one of them.
    index_docs = [d for d in docs if hash_bucket(d["doc_id"]) < 80][:8]
    ids, next_id = ids_with_bucket(next_id, lambda b: b >= 80, len(index_docs))
    for new_id, d in zip(ids, index_docs):
        rows.append(doc(new_id, d["text"], d["source"], d["lang"]))
    manifest["d26_index_dups"] = ids

    # (b) d26 within-batch copies: fresh unique texts, each planted 3x in
    # the batch bucket — d26 keeps min doc_id with n_batch_copies=3.
    triples = []
    for i in range(4):
        text = fresh_text()
        ids, next_id = ids_with_bucket(next_id, lambda b: b >= 80, 3)
        for new_id in ids:
            rows.append(doc(new_id, text, sources[i % len(sources)]))
        triples.append(ids)
    manifest["d26_batch_triples"] = triples

    # (c) d14 redaction branch: URL- and email-bearing docs. One shared
    # email and URL literal — 2 new tokens total, not 2 per doc.
    pii_ids = []
    for i in range(10):
        text = (fresh_text() +
                " user@example.com https://example.com/a?q=1 " + fresh_text())
        rows.append(doc(next_id, text, sources[i % len(sources)]))
        pii_ids.append(next_id)
        next_id += 1
    manifest["d14_pii_docs"] = pii_ids

    # (d) exact duplicates regardless of bucket (d01 collapse) and
    # near-duplicates (one word swapped for another vocab word — LSH
    # candidate branches).
    dup_ids, near_ids, near_pairs = [], [], []
    for i, d in enumerate(docs[:6]):
        rows.append(doc(next_id, d["text"], d["source"], d["lang"]))
        dup_ids.append(next_id)
        next_id += 1
        words = d["text"].split()
        mid = len(words) // 2
        words[mid] = next(w for w in vocab if w != words[mid])
        near = " ".join(words)
        if near not in texts:
            texts.add(near)
            rows.append(doc(next_id, near, d["source"], d["lang"]))
            near_ids.append(next_id)
            near_pairs.append([d["doc_id"], next_id])
            next_id += 1
    manifest["d01_exact_dups"] = dup_ids
    manifest["near_dups"] = near_ids
    # (original, near) pairs for d30's branch check: a near-dup whose
    # original sits in the index buckets (<80) and which itself lands in
    # the batch buckets (>=80) must be REJECTED by the incremental
    # near-dup probe
    manifest["d30_neardup_pairs"] = [
        [o, n] for o, n in near_pairs
        if hash_bucket(o) < 80 and hash_bucket(n) >= 80]

    # (e) d28 rare-token branch: garble docs built from NOVEL singleton
    # tokens (corpus frequency 1 << RareFactor x mean frequency) so
    # rare_ratio >> 0.02 and flagged=1 must fire. 12 new tokens total
    # shared across the three docs, keeping lang en inside d21's exact
    # capacity.
    garble_vocab = [f"zzgarble{i:02d}" for i in range(12)]
    assert not set(garble_vocab) & set(vocab)
    garble_ids = []
    for i in range(3):
        words = ["the", "a"] + [garble_vocab[(i * 4 + j) % 12] for j in range(10)]
        rnd.shuffle(words)
        text = " ".join(words)
        texts.add(text)
        rows.append(doc(next_id, text, sources[i % len(sources)]))
        garble_ids.append(next_id)
        next_id += 1
    manifest["d28_garble_docs"] = garble_ids

    # (f) d29 source-overlap branch: replant source-A texts under
    # source B — the (A, B) pair must show n_common > clean and
    # jaccard > 0 in the overlap matrix.
    src_a, src_b = sources[0], sources[1]
    copied = []
    for d in [d for d in docs if d["source"] == src_a][:12]:
        rows.append(doc(next_id, d["text"], src_b, d["lang"]))
        copied.append(next_id)
        next_id += 1
    manifest["d29_overlap_pair"] = [src_a, src_b]
    manifest["d29_copied_docs"] = copied

    # (g) d29b stop-shingle branch: ONE fixed boilerplate trigram (built
    # from existing vocab words — no new tokens, d21 capacity unchanged)
    # planted into a doc of EVERY source. Its source-level document
    # frequency (= n_sources = 20) exceeds d29b's StopShingleDf=4, so the
    # stop-shingle tier must DROP it while exact d29 counts it in every
    # pair's n_common — check_dirty_branches asserts d29b's n_common for
    # the planted overlap pair is strictly below d29's.
    boiler = " ".join(vocab[:3])
    boiler_ids = []
    for s in sources:
        text = fresh_text() + " " + boiler
        texts.add(text)
        rows.append(doc(next_id, text, s))
        boiler_ids.append(next_id)
        next_id += 1
    manifest["d29b_boilerplate_shingle"] = boiler
    manifest["d29b_boilerplate_docs"] = boiler_ids

    # (h) d38 span-decontamination branch: an eval-bucket (>=95) doc and
    # a train-bucket (<95) doc sharing one 7-token span (existing vocab —
    # d21 capacity unchanged) inside otherwise-distinct text. The
    # surgical tier must excise the shared span from the TRAIN doc
    # (dup_tokens >= 5, partially covered) and must not score the eval
    # doc at all.
    shared_span = " ".join(vocab[3:10])
    eids, next_id = ids_with_bucket(next_id, lambda b: b >= 95, 1)
    etext = fresh_text() + " " + shared_span
    texts.add(etext)
    rows.append(doc(eids[0], etext, sources[0]))
    tids, next_id = ids_with_bucket(next_id, lambda b: b < 95, 1)
    ttext = fresh_text() + " " + shared_span + " " + fresh_text()
    texts.add(ttext)
    rows.append(doc(tids[0], ttext, sources[1]))
    manifest["d38_eval_doc"] = eids[0]
    manifest["d38_train_doc"] = tids[0]

    # (i) d40 containment branch: a doc-in-doc pair INVISIBLE to every
    # resemblance tier — short doc A is a strict prefix of long doc B
    # (same source), so sh(A) ⊆ sh(B): containment c(A→B) = 1.0 exactly
    # while jaccard = |sh(A)|/|sh(B)| stays far below d06's 0.2
    # threshold. Existing vocab only (d21 capacity unchanged).
    a_text = fresh_text(8)                          # 6 shingles
    b_text = a_text + " " + fresh_text(40)          # ≈46 shingles
    texts.add(b_text)
    rows.append(doc(next_id, a_text, sources[2]))
    rows.append(doc(next_id + 1, b_text, sources[2]))
    manifest["d40_contained_pair"] = [next_id, next_id + 1]
    next_id += 2

    # (j) d44 cross-source SYNDICATION branch: the same doc-in-doc shape
    # but across sources — invisible to the source-blocked exact tier BY
    # DESIGN; only d44's sketch-candidate protocol (cross-source element
    # join -> estimate gate -> exact verify) may surface it. md5 sketches
    # are deterministic, so whether the planted pair's hashes collide in
    # the bottom-k sketch is a fixed property of these texts (verified by
    # the branch check below on every regeneration).
    a_text = fresh_text(8)                          # 6 shingles
    b_text = a_text + " " + fresh_text(40)          # ≈46 shingles
    texts.add(b_text)
    rows.append(doc(next_id, a_text, sources[0]))
    rows.append(doc(next_id + 1, b_text, sources[1]))  # DIFFERENT source
    manifest["d44_syndication_pair"] = [next_id, next_id + 1]
    next_id += 2

    # (k) d45 STREAMING syndication branch: the same cross-source
    # doc-in-doc shape, but sized for the streaming ingest's quality gate
    # (>= 10 tokens — the d44 plant's 8-token doc never reaches the
    # syndication stage) and arranged for d45's replay order: the
    # contained doc arrives from the MIN source (sources[0] = the last
    # batch), its container was accepted earlier from another source.
    # Sketch collisions are a fixed property of the texts, so retry the
    # construction until the full three-stage gate provably fires
    # (python replica of bottom-k candidates -> estimate -> exact verify).
    def _sh_hashes(text):
        tk = [w for w in text.lower().split() if w]
        sh = {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
        return {int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh}

    def _synd_gate_fires(at, bt):
        ha, hb = _sh_hashes(at), _sh_hashes(bt)
        bka, bkb = sorted(ha)[:16], sorted(hb)[:16]
        if not set(bka) & set(bkb):
            return False               # stage 1: no shared sketch element
        u = sorted(set(bka) | set(bkb))[:16]
        j = len(set(u) & set(bka) & set(bkb)) / len(u)
        est = j * (len(ha) + len(hb)) / (j + 1.0)
        if max(est / len(ha), est / len(hb)) < 0.4:
            return False               # stage 2: estimate gate
        return len(ha & hb) / len(ha) >= 0.5  # stage 3: exact c12 verify

    while True:
        a_text = fresh_text(16)                     # 14 shingles, gate-sized
        b_text = a_text + " " + fresh_text(40)      # ≈55 shingles, superset
        if b_text not in texts and _synd_gate_fires(a_text, b_text):
            break
    texts.add(b_text)
    rows.append(doc(next_id, a_text, sources[0]))      # MIN source: batch 1
    rows.append(doc(next_id + 1, b_text, sources[1]))  # history: batch 0
    manifest["d45_streaming_pair"] = [next_id, next_id + 1]
    next_id += 2

    # capacity guard: every lang must stay in d21's exact regime
    per_lang = {}
    for d in docs + rows:
        per_lang.setdefault(d["lang"], set()).update(
            w for w in d["text"].lower().split() if w)
    for lang, vs in sorted(per_lang.items()):
        assert len(vs) <= HH_CAPACITY, (lang, len(vs))
        print(f"  lang {lang}: {len(vs)} distinct tokens (cap {HH_CAPACITY})")

    append_rows(os.path.join(src, "documents.parquet"),
                os.path.join(dst, "documents.parquet"), rows)
    return len(rows)


def dirty_customer(src, dst, manifest):
    t = pq.read_table(os.path.join(src, "customer.parquet"))
    next_key = max(t.column("c_custkey").to_pylist()) + 1
    segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
    rows = []
    for i in range(30):
        key = next_key + i
        rows.append({"c_custkey": key, "c_name": f"Customer#{key:09d}",
                     "c_nationkey": i % 25, "c_acctbal": 100.0 + i,
                     "c_mktsegment": segs[i % len(segs)]})
    manifest["q36_never_ordered"] = [r["c_custkey"] for r in rows]
    append_rows(os.path.join(src, "customer.parquet"),
                os.path.join(dst, "customer.parquet"), rows)
    return len(rows)


def dirty_orders(src, dst, manifest):
    """Plant orders whose o_orderdate sits PAST the pandas datetime64[ns]
    horizon (2262-04-11) — the round-15 q52 driver-vs-local divergence
    class, now a validation rule (ts_past_ns_horizon): the ingest layer
    must quarantine these before any warehouse write. Every other field
    is valid so ONLY the horizon rule can tag them. NOTE: the planted
    dates deliberately propagate into interval-building queries' dirty
    outputs — the local us-resolution gate (check.py/duckdb) handles
    them by design; tools/audit_oracle_types.py applies to CLEAN runs."""
    t = pq.read_table(os.path.join(src, "orders.parquet"))
    next_key = max(t.column("o_orderkey").to_pylist()) + 1
    custkeys = sorted(set(t.column("o_custkey").to_pylist()))
    rows, ids = [], []
    for i in range(8):
        key = next_key + i
        rows.append({"o_orderkey": key,
                     "o_custkey": custkeys[i % len(custkeys)],
                     "o_orderstatus": "O",
                     "o_totalprice": 1000.0 + i,
                     # well past 2262-04-11 23:47:16 (ns int64 overflow)
                     "o_orderdate": __import__("datetime").datetime(
                         9999, 1, 1 + i),
                     "o_orderpriority": "3-MEDIUM"})
        ids.append(key)
    manifest["ns_horizon_orders"] = ids
    append_rows(os.path.join(src, "orders.parquet"),
                os.path.join(dst, "orders.parquet"), rows)
    return len(rows)


def dirty_events(src, dst, manifest):
    t = pq.read_table(os.path.join(src, "events.parquet"))
    next_eid = max(t.column("event_id").to_pylist()) + 1
    base_user = max(t.column("user_id").to_pylist()) + 1000
    base_ts = 1705000000 * 10**9  # 2024-01-11, inside the data's range
    rows, users = [], {}

    def ev(user, minute, etype):
        nonlocal next_eid
        rows.append({"event_id": next_eid, "ts": base_ts + minute * 60 * 10**9,
                     "user_id": user, "event_type": etype,
                     "value": 5.0 + minute, "props": '{"k": %d}' % minute})
        next_eid += 1

    # purchase and click BEFORE any view: counts at step 1 only
    users["purchase_first"] = base_user
    for m, e in enumerate(["purchase", "click", "view"]):
        ev(base_user, m, e)
    # click before view, purchase before qualified click: step 1 only
    users["click_first"] = base_user + 1
    for m, e in enumerate(["click", "view", "purchase"]):
        ev(base_user + 1, m, e)
    # in-order control: must reach all three steps
    users["in_order"] = base_user + 2
    for m, e in enumerate(["view", "click", "purchase"]):
        ev(base_user + 2, m, e)
    manifest["q46_users"] = users
    append_rows(os.path.join(src, "events.parquet"),
                os.path.join(dst, "events.parquet"), rows)
    return len(rows)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dirty_sf0.01"
    os.makedirs(dst, exist_ok=True)
    manifest = {"src": src}
    for tbl in TABLES:
        if tbl not in ("documents", "customer", "events", "orders"):
            shutil.copyfile(os.path.join(src, f"{tbl}.parquet"),
                            os.path.join(dst, f"{tbl}.parquet"))
    nd = dirty_documents(src, dst, manifest)
    nc = dirty_customer(src, dst, manifest)
    ne = dirty_events(src, dst, manifest)
    no = dirty_orders(src, dst, manifest)
    with open(os.path.join(dst, "dirty_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"dirty dir at {dst}: +{nd} documents, +{nc} customers, "
          f"+{ne} events, +{no} orders")


if __name__ == "__main__":
    main()
