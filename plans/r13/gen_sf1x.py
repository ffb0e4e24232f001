#!/usr/bin/env python
"""Generate the sf1-class SIDE dataset (VERDICT r12 item 9): a 10x
replica of /root/testdata/sf0.1 written to /tmp/sf1x (untracked — the
tracked baseline stays sf0.1; this exists so the 8c/32c scaling ratios
can be measured once at a scale where parallelism, not scheduling
overhead, dominates).

Replication preserves the workload's shape without creating cross-copy
artifacts:
- every key domain gets a per-copy offset of (max_key + 1), so joins
  (orders<->lineitem<->part/supplier, customer, events.user_id) stay
  consistent and selectivities scale linearly;
- region/nation stay as-is (dimensions);
- documents: text of copy k>0 is vowel-rotated (a 1:1 translate, so
  n_chars stays exact) — intra-copy near-dup structure is preserved
  EXACTLY (the same transform applies to every doc of the copy) while
  cross-copy token sets diverge, so pair-mining queries scale like 10x
  corpora rather than degenerating into 10-way duplicate cliques;
- embeddings: copy k's vectors are dimension-rolled by k — cosine is
  invariant under a common permutation, so intra-copy kNN structure is
  identical and cross-copy cosines decorrelate.

Deterministic (no RNG). Usage: python plans/r13/gen_sf1x.py [N_COPIES]
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1x"
VOWELS = "aeiou"


def _rot_vowels(k: int) -> tuple[str, str]:
    r = k % len(VOWELS)
    lower = VOWELS[r:] + VOWELS[:r]
    return VOWELS + VOWELS.upper(), lower + lower.upper()


def _offset(col: pa.ChunkedArray) -> int:
    return int(pc.max(col).as_py()) + 1


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(DST, exist_ok=True)
    tabs = {
        t: pq.read_table(f"{SRC}/{t}.parquet")
        for t in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings".split()
        )
    }
    offs = {
        "cust": _offset(tabs["customer"]["c_custkey"]),
        "supp": _offset(tabs["supplier"]["s_suppkey"]),
        "part": _offset(tabs["part"]["p_partkey"]),
        "order": _offset(tabs["orders"]["o_orderkey"]),
        "event": _offset(tabs["events"]["event_id"]),
        "user": _offset(tabs["events"]["user_id"]),
        "doc": _offset(tabs["documents"]["doc_id"]),
        "vec": _offset(tabs["embeddings"]["vec_id"]),
    }
    # dimension tables pass through unchanged
    for t in ("region", "nation"):
        pq.write_table(tabs[t], f"{DST}/{t}.parquet")

    shift = {
        "customer": {"c_custkey": "cust"},
        "supplier": {"s_suppkey": "supp"},
        "part": {"p_partkey": "part"},
        "orders": {"o_orderkey": "order", "o_custkey": "cust"},
        "lineitem": {
            "l_orderkey": "order",
            "l_partkey": "part",
            "l_suppkey": "supp",
        },
        "events": {"event_id": "event", "user_id": "user"},
        "documents": {"doc_id": "doc"},
        "embeddings": {"vec_id": "vec"},
    }

    for t, keymap in shift.items():
        src = tabs[t]
        copies = []
        for k in range(n_copies):
            tab = src
            for col, dom in keymap.items():
                idx = tab.schema.get_field_index(col)
                shifted = pc.add(
                    tab[col], pa.scalar(k * offs[dom], type=pa.int64())
                ).cast(tab.schema.field(col).type)
                tab = tab.set_column(idx, tab.schema.field(col), shifted)
            if t == "documents" and k > 0:
                frm, to = _rot_vowels(k)
                idx = tab.schema.get_field_index("text")
                # 1:1 char translate: n_chars stays exact
                txt = tab["text"].to_pandas().str.translate(
                    str.maketrans(frm, to)
                )
                tab = tab.set_column(
                    idx,
                    tab.schema.field("text"),
                    pa.array(txt, type=pa.string()),
                )
            if t == "embeddings" and k > 0:
                idx = tab.schema.get_field_index("embedding")
                mat = np.stack(
                    tab["embedding"].to_pandas().to_numpy()
                )
                rolled = np.roll(mat, k, axis=1).astype(np.float32)
                tab = tab.set_column(
                    idx,
                    tab.schema.field("embedding"),
                    pa.array(list(rolled), type=pa.list_(pa.float32())),
                )
            copies.append(tab)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{DST}/{t}.parquet")
        print(f"{t}: {src.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
