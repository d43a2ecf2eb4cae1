#!/usr/bin/env python3
"""Scale-stress tier generator: build an N-fold copy of a driver testdata
tier (default 10x sf0.1 -> "sf1-equivalent") for local at-scale runs of the
full gate + bench. Dev tool only (driver-side python, like check_local.py);
the engine never depends on it.

Why python/pyarrow and not a Spark tool: `events.ts` is stored as parquet
TIMESTAMP(NANOS), which Spark can read (nanosAsLong) but cannot WRITE —
round-tripping through Spark would change the physical type and break both
Tables.events and every DuckDB oracle that treats ts as a timestamp.
pyarrow preserves every physical/logical type bit-for-bit.

Design (all copies deterministic; copy 0 is the untouched seed data):
- Dimension tables (region, nation) are NOT scaled — dimensions don't grow
  with fact data, and every copy's rows reference the same 25 nations.
- Every key column is offset by copy_index * 1_000_000 per key space
  (orderkey, custkey, partkey, suppkey, event_id, user_id, doc_id, vec_id),
  consistently across tables so FK joins stay linear (copy i of orders
  references copy i of customer). 1e6 clears every seed key range (max is
  o_orderkey at 149,999) and every fixture sentinel offset (+10000/+20000/
  +30000 in the dedup fixtures) — no synthetic id can collide with a real
  one, and range/mod fixtures (`doc_id < 250`, `vec_id < 10`, `% 20`)
  keep selecting deterministic subsets.
- documents.text gets a per-copy token suffix (`word` -> `word_3`) so each
  copy has a DISJOINT vocabulary: shingle/minhash/token equi-joins stay
  linear in the copy count (a duplicated vocabulary would grow every
  shingle bucket 10x and every candidate join 100x — a different stress
  than "10x more documents", and one that makes the quadratic-intermediate
  DuckDB oracles intractable). Within a copy, the near-dup structure is
  isomorphic to the seed tier. Empty tokens (double spaces) are preserved.
- embeddings vectors are copied verbatim (new vec_id): identical vectors
  across copies are the realistic exact-dup stress for ANN/cosine paths,
  and every top-k/pair query tiebreaks on id, so results stay
  deterministic in both engines.
- One parquet file per table (the DuckDB oracle reads '{dir}/{t}.parquet'
  as a single path) with many row groups: row_group_size targets ~24
  groups on the big tables, so Spark's byte-range splits map to real
  row-group parallelism like a production many-row-group file. Pair with
  spark.sql.files.maxPartitionBytes sized for ~32 splits when benching.

Usage: scale_up.py [src_dir] [dst_dir] [copies] [tables]
  tables: optional comma-separated subset (e.g. "documents,embeddings")
  for partial tiers — the sf100 dedup stress needs only the corpus
  tables, not 600M lineitem rows.
"""
import json
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDE = 1_000_000
DIMENSIONS = ["region", "nation"]
# table -> columns offset by copy_index * STRIDE (each belongs to one of the
# shared key spaces listed in the module docstring)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def salt_text(texts, copy):
    out = []
    for t in texts:
        if t is None:
            out.append(None)
            continue
        out.append(" ".join(
            f"{w}_{copy}" if w else w for w in t.split(" ")))
    return out


def scale_table(name, src_path, copies):
    seed = pq.read_table(src_path)
    parts = [seed]
    for i in range(1, copies):
        cols = {}
        for field in seed.schema:
            col = seed.column(field.name)
            if field.name in KEY_COLS.get(name, []):
                col = pc.add(col, pa.scalar(i * STRIDE, type=field.type))
            elif name == "documents" and field.name == "text":
                col = pa.array(salt_text(col.to_pylist(), i),
                               type=field.type)
            cols[field.name] = col
        parts.append(pa.table(cols, schema=seed.schema))
    return pa.concat_tables(parts)


def main(src, dst, copies, only=None):
    os.makedirs(dst, exist_ok=True)
    manifest = {"src": src, "copies": copies, "stride": STRIDE, "tables": {}}
    names = DIMENSIONS + sorted(KEY_COLS)
    if only:
        names = [n for n in names if n in only]
    for name in names:
        src_path = f"{src}/{name}.parquet"
        dst_path = f"{dst}/{name}.parquet"
        if name in DIMENSIONS:
            table = pq.read_table(src_path)
        else:
            table = scale_table(name, src_path, copies)
        # ~24 row groups on the big tables; floor keeps tiny tables sane
        rg = max(4096, table.num_rows // 24)
        pq.write_table(table, dst_path, row_group_size=rg)
        meta = pq.ParquetFile(dst_path).metadata
        manifest["tables"][name] = {
            "rows": meta.num_rows, "row_groups": meta.num_row_groups,
            "bytes": os.path.getsize(dst_path)}
        print(f"{name}: {meta.num_rows} rows, {meta.num_row_groups} row "
              f"groups, {os.path.getsize(dst_path) >> 20} MiB")
    with open(f"{dst}/scale_manifest.json", "w") as f:
        json.dump(manifest, f, indent=2)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
         sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1",
         int(sys.argv[3]) if len(sys.argv) > 3 else 10,
         set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None)
