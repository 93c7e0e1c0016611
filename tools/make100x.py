#!/usr/bin/env python3
"""Build the 100x fact sweep dataset at /tmp/sf100x (BASELINE.md r11).

Growth model (the r5/r9/r10 sweeps', two orders further):
  - facts 100x, dimension tables byte-identical (dims grow slower
    than facts);
  - lineitem/orders cloned with CONSISTENTLY shifted order keys
    (l_orderkey joins survive; customers see 100x orders each);
  - events cloned with shifted event/user ids (more users, same
    per-user activity) and ts rewritten as epoch-ns BIGINT (the r10
    driver-schema trick: Spark reads it via the nanosAsLong flag);
  - documents cloned with shifted doc_ids and PER-COPY TAG TOKENS
    interleaved every 7 words (n_chars recomputed): unlike the r9 10x
    exact-clone stress (duplication-factor workload), the 100x
    question is the VOLUME slope, so copies must not be near-dups of
    each other — interleaved tags push every shingle/minhash/gram
    window apart while keeping token-length statistics comparable;
  - embeddings cloned with shifted vec_ids and a small deterministic
    per-copy perturbation (seeded N(0, 0.02) per dim): unique vectors,
    same geometry class.

One parquet file per copy per fact table (100 files each): multi-file
scan splits, snappy, dictionary on.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf100x"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 100

DIMS = ["region", "nation", "customer", "supplier", "part"]


def outdir(name):
    d = os.path.join(OUT, f"{name}.parquet")
    os.makedirs(d, exist_ok=True)
    return d


def shift_col(tbl, name, k, step):
    i = tbl.schema.get_field_index(name)
    return tbl.set_column(i, name, pc.add(tbl.column(name), k * step))


def write_copies(name, base, make_copy):
    d = outdir(name)
    for k in range(COPIES):
        pq.write_table(make_copy(base, k), os.path.join(d, f"c{k:03d}.parquet"))
    n = COPIES * base.num_rows
    print(f"{name}: {n:,} rows in {COPIES} files")


def main():
    os.makedirs(OUT, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(os.path.join(SRC, f"{t}.parquet"),
                        os.path.join(OUT, f"{t}.parquet"))
    print("dims copied:", ", ".join(DIMS))

    li = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    od = pq.read_table(os.path.join(SRC, "orders.parquet"))
    okstep = pc.max(od.column("o_orderkey")).as_py() + 1
    write_copies("lineitem", li,
                 lambda t, k: shift_col(t, "l_orderkey", k, okstep))
    write_copies("orders", od,
                 lambda t, k: shift_col(t, "o_orderkey", k, okstep))

    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    # normalize ts to epoch-NANOS int64 (the schema graft.Tables's
    # LongType branch expects): driver testdata has shipped both as
    # int64 nanos (pre-r12) and as µs TIMESTAMP_NTZ (r12) — scale the
    # µs form up by 1000, pass an already-int64 ns column through
    tsf = ev.schema.field("ts").type
    tscol = ev.column("ts")
    if pa.types.is_timestamp(tsf):
        mult = {"us": 1000, "ns": 1}[tsf.unit]
        tscol = pc.multiply(tscol.cast(pa.int64()), mult)
    ev = ev.set_column(ev.schema.get_field_index("ts"), "ts", tscol)
    estep = pc.max(ev.column("event_id")).as_py() + 1
    ustep = pc.max(ev.column("user_id")).as_py() + 1

    def ev_copy(t, k):
        return shift_col(shift_col(t, "event_id", k, estep),
                         "user_id", k, ustep)

    write_copies("events", ev, ev_copy)

    dc = pq.read_table(os.path.join(SRC, "documents.parquet"))
    dstep = pc.max(dc.column("doc_id")).as_py() + 1
    words = [t.split(" ") for t in dc.column("text").to_pylist()]
    rest = {n: dc.column(n) for n in ("lang", "source")}

    def doc_copy(_, k):
        tag = f"x{k:03d}"
        texts = []
        for w in words:
            out = []
            for i in range(0, len(w), 7):
                out.extend(w[i:i + 7])
                out.append(tag)
            texts.append(" ".join(out))
        ta = pa.array(texts, pa.string())
        return pa.table({
            "doc_id": pc.add(dc.column("doc_id"), k * dstep),
            "text": ta,
            "lang": rest["lang"],
            "source": rest["source"],
            "n_chars": pc.utf8_length(ta).cast(pa.int64()),
        })

    write_copies("documents", dc, doc_copy)

    em = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    vstep = pc.max(em.column("vec_id")).as_py() + 1
    vecs = np.array(em.column("embedding").to_pylist(), dtype=np.float32)

    def em_copy(_, k):
        rng = np.random.default_rng(k)
        pert = vecs + rng.normal(0.0, 0.02, vecs.shape).astype(np.float32)
        return pa.table({
            "vec_id": pc.add(em.column("vec_id"), k * vstep),
            "embedding": pa.array(list(pert), pa.list_(pa.float32())),
            "label": em.column("label"),
        })

    write_copies("embeddings", em, em_copy)


if __name__ == "__main__":
    main()
