#!/usr/bin/env python3
"""Derive a larger scale factor from an existing testdata dir (round-8
verdict item #6: stretch one bench scale to expose constants the small
scales hide).

Replication scheme: K replicas of every fact/dim row with each key
domain offset by replica * BASE(domain), where BASE is the next power
of 10 above the domain's max key — foreign keys stay consistent within
a replica and never collide across replicas. region/nation stay fixed
(the TPC-H constants). Documents get a per-replica suffix token
(" xr<r>") so the corpus does not degenerate into 90% exact duplicates
(which would blow up every pairwise-similarity query quadratically);
that adds K-1 tokens to the vocabulary, still far inside d21's exact
Misra-Gries capacity (64). --salt-tokens instead suffixes EVERY token
(bijection per replica; see below) — that multiplies the vocabulary by
K, which EXCEEDS d21's exact regime: salted fixtures are BENCH
fixtures (linear pair density for engine-scaling runs); the ORACLE
gate must use the default suffix mode (measured: d21 hash-mismatches
on a salted sf1, round 13). Embeddings perturb component 0 by r * 1e-3
(stored float32, identical bytes to both engines) so replicas are not
bitwise-tied in top-k orderings.

Dev harness (driver-side python stack), not part of the shipped library.
Usage: python3 tools/make_sf.py [src_sf_dir] [dst_dir] [K]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def base_of(max_key):
    b = 10
    while b <= max_key:
        b *= 10
    return b


def replicate(src, dst, name, key_offsets, k, bases, text_suffix=False,
              embed_perturb=False, text_salt=False):
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    t = t.replace_schema_metadata(None)
    parts = []
    for r in range(k):
        cols = []
        salted_text = None
        if text_salt and r > 0 and "text" in t.schema.names:
            # token-level bijection: suffix EVERY token with a replica tag.
            # A bijection on tokens preserves every within-replica
            # similarity EXACTLY (Jaccard/containment/span structure are
            # set/sequence relations over tokens) while making
            # cross-replica overlap zero — so planted pair counts scale
            # LINEARLY in K instead of C(K,2), and a big-SF bench measures
            # engine scaling, not fixture pair density (round-12 answer to
            # the d11-superlinearity diagnosis).
            salted_text = pc.replace_substring_regex(
                t.column("text"), pattern=r"(\S+)",
                replacement=f"\\1~r{r}")
        for field in t.schema:
            c = t.column(field.name)
            if field.name in key_offsets and r > 0:
                c = pc.add(c, r * bases[field.name]).cast(field.type)
            elif field.name == "text" and salted_text is not None:
                c = salted_text
            elif field.name == "n_chars" and salted_text is not None:
                c = pc.utf8_length(salted_text).cast(field.type)
            elif field.name == "text" and text_suffix and r > 0:
                c = pc.binary_join_element_wise(
                    c, pa.scalar(f" xr{r}"), "")
            elif field.name == "n_chars" and text_suffix and r > 0:
                c = pc.add(c, len(f" xr{r}")).cast(field.type)
            elif field.name == "embedding" and embed_perturb and r > 0:
                flat = c.combine_chunks()
                arrs = []
                for chunk in (flat.chunks if isinstance(flat, pa.ChunkedArray) else [flat]):
                    values = chunk.values.to_numpy(zero_copy_only=False).copy()
                    offsets = chunk.offsets.to_numpy(zero_copy_only=False)
                    values[offsets[:-1]] += r * 1e-3  # component 0 per row
                    arrs.append(pa.ListArray.from_arrays(
                        pa.array(offsets, type=pa.int32()),
                        pa.array(values, type=pa.float32())))
                c = pa.chunked_array(arrs).cast(field.type)
            cols.append(c)
        parts.append(pa.table(dict(zip(t.schema.names, cols))).cast(t.schema))
    # bounded row groups (round 15): pyarrow's default wrote ONE row
    # group per table — /tmp/sf10's 500k-row documents.parquet gave
    # Spark 15 "splits" of which 14 were empty, so d35's candidate-phase
    # partial aggregate ran the WHOLE 25M-fingerprint corpus in one task
    # (the 2.1 GB max_task_peak outlier in SPILL_CENSUS, and a 51 s
    # straggler). A row group is the minimum scan-split unit; production
    # corpora have thousands of them (d47's OPTIMIZE tier keeps that
    # true on a real lake), so the stretch fixtures must too — same
    # lesson make_skewed.py already applies to the hot-bucket fixture.
    pq.write_table(pa.concat_tables(parts), os.path.join(dst, f"{name}.parquet"),
                   row_group_size=32768)
    return k * t.num_rows


def main():
    salt = "--salt-tokens" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    dst = argv[1] if len(argv) > 1 else "/tmp/sf1"
    k = int(argv[2]) if len(argv) > 2 else 10
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copyfile(os.path.join(src, f"{t}.parquet"),
                        os.path.join(dst, f"{t}.parquet"))
    # per-DOMAIN bases from each domain's OWNING table, so foreign keys
    # in other tables use the same offset even when their local max sits
    # below a power-of-10 boundary the owner crossed
    def dom_base(table, col):
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
        return base_of(pc.max(t.column(col)).as_py())
    bases = {
        "c_custkey": dom_base("customer", "c_custkey"),
        "s_suppkey": dom_base("supplier", "s_suppkey"),
        "p_partkey": dom_base("part", "p_partkey"),
        "o_orderkey": dom_base("orders", "o_orderkey"),
        "event_id": dom_base("events", "event_id"),
        "user_id": dom_base("events", "user_id"),
        "doc_id": dom_base("documents", "doc_id"),
        "vec_id": dom_base("embeddings", "vec_id"),
    }
    bases.update({  # FK columns share their domain's base
        "o_custkey": bases["c_custkey"],
        "l_orderkey": bases["o_orderkey"],
        "l_partkey": bases["p_partkey"],
        "l_suppkey": bases["s_suppkey"],
    })
    spec = {
        "customer": dict(key_offsets=["c_custkey"]),
        "supplier": dict(key_offsets=["s_suppkey"]),
        "part": dict(key_offsets=["p_partkey"]),
        "orders": dict(key_offsets=["o_orderkey", "o_custkey"]),
        "lineitem": dict(key_offsets=["l_orderkey", "l_partkey", "l_suppkey"]),
        "events": dict(key_offsets=["event_id", "user_id"]),
        "documents": dict(key_offsets=["doc_id"],
                          text_suffix=not salt, text_salt=salt),
        "embeddings": dict(key_offsets=["vec_id"], embed_perturb=True),
    }
    for name, kw in spec.items():
        n = replicate(src, dst, name, k=k, bases=bases, **kw)
        print(f"  {name}: {n} rows")
    print(f"derived x{k} scale at {dst}")


if __name__ == "__main__":
    main()
