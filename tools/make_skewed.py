#!/usr/bin/env python3
"""Derive a SKEWED copy of a testdata scale dir (round-11 verdict item #2).

The synthetic fixtures are uniformly keyed, so the salted skew paths
(q18b keepFirstSalted, d34b salted stratified sampling) are equality-
tested but never DEMONSTRATED against actual skew. This script copies a
scale dir and plants two hot keys:

  lineitem:   ~HOT_FRACTION of all rows get one (l_partkey, l_suppkey)
              pair — q18's window concentrates all of them on ONE task,
              q18b's 16 salt shards split them
  documents:  ~HOT_FRACTION of all docs get one (lang, source) stratum
              ("xx", "hotsrc") — d34's per-cell rank window concentrates
              the cell, d34b's salted two-phase spreads it

Row order, row counts, and every parquet schema are preserved exactly;
only the named key columns of every HOT_MODth row change, so the
existing oracle gate (graft.Verify + tools/check.py) stays the
correctness check on the skewed copy — same data, both engines. The
task-time census comes from graft.SkewBench.

Dev harness (driver-side python stack), not part of the shipped library.
Usage: python3 tools/make_skewed.py [src_sf_dir] [dst_dir]
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HOT_MOD = 5  # every 5th row -> the hot key: ~20% of the table

HOT_PARTKEY = 42
HOT_SUPPKEY = 7
HOT_LANG = "xx"
HOT_SOURCE = "hotsrc"


def hot_mask(n):
    return pa.array([i % HOT_MOD == 0 for i in range(n)])


def skew_lineitem(src, dst):
    t = pq.read_table(os.path.join(src, "lineitem.parquet"))
    t = t.replace_schema_metadata(None)
    mask = hot_mask(t.num_rows)
    cols = []
    for field in t.schema:
        c = t.column(field.name)
        if field.name == "l_partkey":
            c = pc.if_else(mask, pa.scalar(HOT_PARTKEY).cast(field.type),
                           c.combine_chunks()).cast(field.type)
        elif field.name == "l_suppkey":
            c = pc.if_else(mask, pa.scalar(HOT_SUPPKEY).cast(field.type),
                           c.combine_chunks()).cast(field.type)
        cols.append(c)
    out = pa.table(dict(zip(t.schema.names, cols)), schema=t.schema)
    pq.write_table(out, os.path.join(dst, "lineitem.parquet"))
    return t.num_rows


def skew_documents(src, dst):
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    t = t.replace_schema_metadata(None)
    mask = hot_mask(t.num_rows)
    cols = []
    for field in t.schema:
        c = t.column(field.name)
        if field.name == "lang":
            c = pc.if_else(mask, pa.scalar(HOT_LANG).cast(field.type),
                           c.combine_chunks()).cast(field.type)
        elif field.name == "source":
            c = pc.if_else(mask, pa.scalar(HOT_SOURCE).cast(field.type),
                           c.combine_chunks()).cast(field.type)
        cols.append(c)
    out = pa.table(dict(zip(t.schema.names, cols)), schema=t.schema)
    pq.write_table(out, os.path.join(dst, "documents.parquet"))
    return t.num_rows


def skew_orderkey(src, dst):
    """--hot-orderkey mode (round 12): plant the hot key on the ONE join
    column that actually shuffles (l_orderkey; part/supplier joins are
    broadcast and therefore skew-immune), so AQE's skew-join splitting
    has something to absorb and the census can show it firing. The hot
    key is the smallest existing o_orderkey, so every rewritten row
    still matches exactly one order and the oracle gate stays the
    correctness check (same data, both engines)."""
    orders = pq.read_table(os.path.join(src, "orders.parquet"),
                           columns=["o_orderkey"])
    hot = pc.min(orders.column("o_orderkey")).as_py()
    t = pq.read_table(os.path.join(src, "lineitem.parquet"))
    t = t.replace_schema_metadata(None)
    mask = hot_mask(t.num_rows)
    cols = []
    for field in t.schema:
        c = t.column(field.name)
        if field.name == "l_orderkey":
            c = pc.if_else(mask, pa.scalar(hot).cast(field.type),
                           c.combine_chunks()).cast(field.type)
        cols.append(c)
    out = pa.table(dict(zip(t.schema.names, cols)), schema=t.schema)
    pq.write_table(out, os.path.join(dst, "lineitem.parquet"))
    return t.num_rows, hot


def skew_embeddings(src, dst):
    """--hot-bucket mode (round 14): plant sign-LSH bucket skew for a09's
    k-NN candidate join. Every HOT_MODth vector gets its first 8
    components replaced by their absolute values, so all of them land in
    sign bucket 2^8-1 (a09's LshBits=8 contract) — the clustered-corpus
    shape where one bucket holds ~20% of both join sides. Caveat (ADVICE
    r14): signBucket sets a bit only for strictly-positive components, so
    a hot row with an exact 0.0 among its first 8 components would land
    elsewhere — the generator draws continuous floats, so exact zeros
    are improbable and the ~20% invariant is approximate, not
    guaranteed. abs() preserves
    the norm and every other component, row order and schema unchanged,
    so a09Sql in DuckDB over the same copy remains the correctness check
    (same data, both engines)."""
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    t = t.replace_schema_metadata(None)
    emb = t.column("embedding").combine_chunks()
    vals = []
    for i, v in enumerate(emb):
        lst = v.as_py()
        if i % HOT_MOD == 0:
            lst = [abs(x) for x in lst[:8]] + lst[8:]
        vals.append(lst)
    cols = []
    for field in t.schema:
        if field.name == "embedding":
            cols.append(pa.array(vals, type=field.type))
        else:
            cols.append(t.column(field.name))
    out = pa.table(dict(zip(t.schema.names, cols)), schema=t.schema)
    # many small row groups: AQE's skew-join split works at MAP-OUTPUT
    # granularity, and a row group is the minimum scan unit — a
    # single-row-group file funnels every hot row through one map task
    # and the hot reduce partition becomes structurally unsplittable
    # (measured: "number of skewed partitions: left 0" in the
    # OptimizeSkewedJoin debug log until this was split). Production
    # corpora have thousands of row groups; 4k rows per group restores
    # that shape at fixture scale.
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"),
                   row_group_size=4096)
    return t.num_rows


def plant_neighbors(src, dst):
    """--planted mode (round 15): serving-grade recall fixture for the
    banded k-NN join (a09b). For every even vec_id 2t (a09's probe
    side), the odd row 2t+1 (the index side) is rewritten to a vector at
    EXACTLY cosine 0.9 from the probe: w = |v|(0.9·v̂ + sqrt(1-0.81)·û⊥)
    with û⊥ a seeded random unit vector orthogonalized against v̂. Random
    64-dim vectors top out near cosine ~0.4, so the planted twins are
    unambiguous serving truth (every pair with cos ≥ 0.85 is planted),
    and the census measures what fraction each tier's candidate
    generation recovers — the recall@serving number the organic fixture
    (whose global top-3 are far pairs no LSH should be judged on)
    cannot produce. Norm of each index row is preserved; probe rows,
    labels, row order, and schema are untouched, so a09/a09b's oracles
    stay runnable on the copy."""
    import numpy as np
    rng = np.random.default_rng(15)
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    t = t.replace_schema_metadata(None)
    emb = np.array(t.column("embedding").combine_chunks().to_pylist(),
                   dtype=np.float64)
    n, dim = emb.shape
    cos_target = 0.9
    sin_target = (1.0 - cos_target * cos_target) ** 0.5
    for k in range(0, n - 1, 2):
        v = emb[k]
        vhat = v / np.linalg.norm(v)
        u = rng.standard_normal(dim)
        uperp = u - (u @ vhat) * vhat
        uhat = uperp / np.linalg.norm(uperp)
        emb[k + 1] = np.linalg.norm(emb[k + 1]) * (
            cos_target * vhat + sin_target * uhat)
    field = t.schema.field("embedding")
    vals = pa.array(emb.astype(np.float32).tolist(), type=field.type)
    cols = [vals if f.name == "embedding" else t.column(f.name)
            for f in t.schema]
    out = pa.table(dict(zip(t.schema.names, cols)), schema=t.schema)
    pq.write_table(out, os.path.join(dst, "embeddings.parquet"))
    return n


def skew_custkey(src, dst):
    """--hot-custkey mode (round 17): plant the hot key on the SCD-2
    family's shuffle column (o_custkey — q52/q52b/q52c window and merge
    on it), so one customer owns ~20% of all order change records. The
    hot key is the smallest existing o_custkey, so every rewritten row
    still references a real customer and the oracle gate stays the
    correctness check (same data, both engines). This is the
    one-dimension-changes-constantly shape: the hot key's interval
    history is ~20% of the table, all of it in ONE window partition and
    one lake bucket — what the per-key-bounded claim has to absorb."""
    orders_keys = pq.read_table(os.path.join(src, "orders.parquet"),
                                columns=["o_custkey"])
    hot = pc.min(orders_keys.column("o_custkey")).as_py()
    t = pq.read_table(os.path.join(src, "orders.parquet"))
    t = t.replace_schema_metadata(None)
    mask = hot_mask(t.num_rows)
    cols = []
    for field in t.schema:
        c = t.column(field.name)
        if field.name == "o_custkey":
            c = pc.if_else(mask, pa.scalar(hot).cast(field.type),
                           c.combine_chunks()).cast(field.type)
        cols.append(c)
    out = pa.table(dict(zip(t.schema.names, cols)), schema=t.schema)
    # multi-row-group (see skew_embeddings note): keep hot rows spread
    # across many scan units so map-side shapes match production
    pq.write_table(out, os.path.join(dst, "orders.parquet"),
                   row_group_size=32768)
    return t.num_rows, hot


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    hot_orderkey = "--hot-orderkey" in sys.argv
    hot_bucket = "--hot-bucket" in sys.argv
    hot_custkey = "--hot-custkey" in sys.argv
    planted = "--planted" in sys.argv
    if hot_custkey:
        src = argv[0] if len(argv) > 0 else "/tmp/sf1"
        dst = argv[1] if len(argv) > 1 else "/tmp/sf1_skewcust"
        os.makedirs(dst, exist_ok=True)
        for name in TABLES:
            p = os.path.join(src, f"{name}.parquet")
            if os.path.exists(p) and name != "orders":
                shutil.copyfile(p, os.path.join(dst, f"{name}.parquet"))
        no, hot = skew_custkey(src, dst)
        print(f"hot-custkey copy at {dst}: o_custkey={hot} holds "
              f"~{100 // HOT_MOD}% of {no} orders")
        return
    if planted:
        src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
        dst = argv[1] if len(argv) > 1 else "/tmp/sf01_planted"
        os.makedirs(dst, exist_ok=True)
        for name in TABLES:
            p = os.path.join(src, f"{name}.parquet")
            if os.path.exists(p) and name != "embeddings":
                shutil.copyfile(p, os.path.join(dst, f"{name}.parquet"))
        ne = plant_neighbors(src, dst)
        print(f"planted-neighbor copy at {dst}: every odd row is its even "
              f"probe's cosine-0.9 twin ({ne} embeddings)")
        return
    if hot_bucket:
        src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
        dst = argv[1] if len(argv) > 1 else "/tmp/sf01_hotbucket"
        os.makedirs(dst, exist_ok=True)
        for name in TABLES:
            p = os.path.join(src, f"{name}.parquet")
            if os.path.exists(p) and name != "embeddings":
                shutil.copyfile(p, os.path.join(dst, f"{name}.parquet"))
        ne = skew_embeddings(src, dst)
        print(f"hot-bucket copy at {dst}: sign bucket 255 holds "
              f"~{100 // HOT_MOD}% of {ne} embeddings")
        return
    src = argv[0] if len(argv) > 0 else "/tmp/sf1"
    dst = argv[1] if len(argv) > 1 else (
        "/tmp/sf1_skewjoin" if hot_orderkey else "/tmp/sf1_skew")
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        p = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        if name == "lineitem" or (name == "documents" and not hot_orderkey):
            continue  # rewritten below
        shutil.copyfile(p, os.path.join(dst, f"{name}.parquet"))
    if hot_orderkey:
        nl, hot = skew_orderkey(src, dst)
        print(f"skew-join copy at {dst}: hot l_orderkey={hot} holds "
              f"~{100 // HOT_MOD}% of {nl} lineitem rows")
        return
    nl = skew_lineitem(src, dst)
    nd = skew_documents(src, dst)
    print(f"skewed copy at {dst}: hot ({HOT_PARTKEY},{HOT_SUPPKEY}) holds "
          f"~{100 // HOT_MOD}% of {nl} lineitem rows; hot stratum "
          f"({HOT_LANG},{HOT_SOURCE}) holds ~{100 // HOT_MOD}% of {nd} docs")


if __name__ == "__main__":
    main()
