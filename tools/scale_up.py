#!/usr/bin/env python3
"""Deterministic 10x scale-up of an sf directory — a STRESS fixture for
the one-off sf1 sweep (SCALE.md), not driver truth.

Each output table is K shifted copies of the source: primary/foreign
keys are shifted by i * BASE consistently across tables (orders.o_custkey
moves with customer.c_custkey, lineitem moves with orders/part/supplier),
so join cardinalities scale linearly and keys stay unique. Document
texts get a per-copy suffix so the corpus keeps its "no exact duplicate
texts" property (the copies become NEAR-duplicates — the realistic
web-crawl shape); n_chars is adjusted to stay consistent with the text.
Dimension tables (region, nation) are shared and copied as-is. All
schemas (including events' TIMESTAMP(NANOS) ts) are preserved exactly
via pyarrow.

Usage: scale_up.py SRC_DIR DST_DIR [K]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

BASES = {
    "c_custkey": 100_000, "o_custkey": 100_000,
    "o_orderkey": 1_000_000, "l_orderkey": 1_000_000,
    "p_partkey": 100_000, "l_partkey": 100_000,
    "s_suppkey": 10_000, "l_suppkey": 10_000,
    "event_id": 1_000_000, "user_id": 10_000,
    "doc_id": 1_000_000, "vec_id": 1_000_000,
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SHARED_DIMS = {"region", "nation"}


def scale(src, dst, k):
    import os
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(f"{src}/{name}.parquet")
        if name in SHARED_DIMS:
            pq.write_table(t, f"{dst}/{name}.parquet")
            print(f"{name}: copied ({t.num_rows} rows)")
            continue
        copies = []
        for i in range(k):
            cols = []
            for field in t.schema:
                col = t.column(field.name)
                if field.name in BASES and i > 0:
                    col = pc.add(col, pa.scalar(i * BASES[field.name],
                                                type=field.type))
                elif name == "documents" and field.name == "text" and i > 0:
                    col = pc.binary_join_element_wise(
                        col.cast(pa.string()), f" ~{i}", "")
                elif name == "documents" and field.name == "n_chars" and i > 0:
                    col = pc.add(col, pa.scalar(len(f" ~{i}"),
                                                type=field.type))
                cols.append(col)
            copies.append(pa.table(cols, schema=t.schema))
        out = pa.concat_tables(copies)
        # One row group per source-sized copy: the source files carry one
        # row group for the whole table, so the k-fold output carries k —
        # without this the scaled table is ONE row group and every scan
        # is a single task (row groups are parquet's split unit), which
        # benchmarks the fixture's layout, not the engine.
        pq.write_table(out, f"{dst}/{name}.parquet",
                       row_group_size=max(t.num_rows, 1))
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows "
              f"({k} row groups)")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scale(src, dst, k)
