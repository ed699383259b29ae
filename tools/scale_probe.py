#!/usr/bin/env python
"""Bench-only scale probe: an N-times key-remapped scale-up of a testdata
SF directory (default: sf0.1 -> a synthetic "sf1") written OUTSIDE the
repo/testdata trees.

Purpose (VERDICT r4 ask #6): all bench history is sf0.1; a query whose
wall time grows much faster than N-times the data flags a nonlinearity
(candidate-pair blowup, skew, state explosion) that sf0.1 cannot see.
This probe is NOT testdata and carries no correctness claims — oracles
always run on the driver-generated SFs.

Construction, per replica r in 1..N-1 (replica 0 is the original):
- region/nation: tiny dims, copied once (joins stay broadcastable — at
  real sf1 they are the same 5/25 rows).
- customer/supplier/part/orders/lineitem: keys shifted by r * stride per
  key domain, preserving every FK relationship (o_custkey follows the
  customer shift, l_orderkey/l_partkey/l_suppkey follow theirs) and the
  per-key fanout distribution. Measures untouched.
- events: event_id/user_id shifted; timestamps UNchanged, so each window
  holds N-times the rows and distinct users — the streaming-state scale
  axis.
- documents: text REGENERATED per replica (same empirical vocabulary and
  length distribution, independent token draws, seeded per replica/doc).
  Copying text verbatim would make every doc a 10-way exact duplicate and
  near-dup candidate pairs would grow ~N^2/2-times, which is a different
  workload than N-times the data; statistically-similar independent text
  keeps dedup scaling honest.
- embeddings: vectors regenerated per replica from the original
  per-component moments (near-orthogonality preserved, no planted
  cross-replica twins), labels resampled from the empirical label
  distribution.

Usage:
    python tools/scale_probe.py [--src /root/testdata/sf0.1] \
        [--dst /tmp/gmall_scale_probe] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _read(src: str, name: str) -> pa.Table:
    return pq.read_table(os.path.join(src, f"{name}.parquet"))


def _write(dst: str, name: str, tables: list[pa.Table]) -> None:
    out = pa.concat_tables(tables)
    pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
    print(f"  {name}: {out.num_rows} rows")


def _shift(t: pa.Table, shifts: dict[str, int], r: int) -> pa.Table:
    cols = []
    for field in t.schema:
        col = t.column(field.name)
        if field.name in shifts and r > 0:
            col = pa.chunked_array(
                [
                    pa.compute.add(c, pa.scalar(r * shifts[field.name], field.type))
                    for c in col.chunks
                ]
            )
        cols.append(col)
    return pa.table(dict(zip(t.column_names, cols)))


def _stride(t: pa.Table, key: str) -> int:
    return int(pa.compute.max(t.column(key)).as_py()) + 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/gmall_scale_probe")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    n = args.factor

    # tiny dims: copy once
    for name in ("region", "nation"):
        _write(args.dst, name, [_read(args.src, name)])

    cust = _read(args.src, "customer")
    supp = _read(args.src, "supplier")
    part = _read(args.src, "part")
    orders = _read(args.src, "orders")
    li = _read(args.src, "lineitem")
    strides = {
        "cust": _stride(cust, "c_custkey"),
        "supp": _stride(supp, "s_suppkey"),
        "part": _stride(part, "p_partkey"),
        "order": _stride(orders, "o_orderkey"),
    }
    _write(
        args.dst, "customer",
        [_shift(cust, {"c_custkey": strides["cust"]}, r) for r in range(n)],
    )
    _write(
        args.dst, "supplier",
        [_shift(supp, {"s_suppkey": strides["supp"]}, r) for r in range(n)],
    )
    _write(
        args.dst, "part",
        [_shift(part, {"p_partkey": strides["part"]}, r) for r in range(n)],
    )
    _write(
        args.dst, "orders",
        [
            _shift(
                orders,
                {"o_orderkey": strides["order"], "o_custkey": strides["cust"]},
                r,
            )
            for r in range(n)
        ],
    )
    _write(
        args.dst, "lineitem",
        [
            _shift(
                li,
                {
                    "l_orderkey": strides["order"],
                    "l_partkey": strides["part"],
                    "l_suppkey": strides["supp"],
                },
                r,
            )
            for r in range(n)
        ],
    )

    ev = _read(args.src, "events")
    ev_strides = {
        "event_id": _stride(ev, "event_id"),
        "user_id": _stride(ev, "user_id"),
    }
    _write(args.dst, "events", [_shift(ev, ev_strides, r) for r in range(n)])

    # documents: regenerate text per replica (see module docstring)
    docs = _read(args.src, "documents")
    doc_ids = np.asarray(docs.column("doc_id"))
    texts = docs.column("text").to_pylist()
    langs = docs.column("lang").to_pylist()
    sources = docs.column("source").to_pylist()
    vocab = sorted({w for t in texts for w in t.split()})
    lens = np.array([len(t.split()) for t in texts])
    d_stride = int(doc_ids.max()) + 1
    out_docs = [docs]
    for r in range(1, n):
        rng = np.random.default_rng(9000 + r)
        new_lens = rng.choice(lens, size=len(texts))
        new_texts = [
            " ".join(rng.choice(vocab, size=int(L))) for L in new_lens
        ]
        out_docs.append(
            pa.table(
                {
                    "doc_id": pa.array(doc_ids + r * d_stride, type=pa.int64()),
                    "text": pa.array(new_texts),
                    "lang": pa.array(
                        rng.choice(langs, size=len(texts)).tolist()
                    ),
                    "source": pa.array(
                        rng.choice(sources, size=len(texts)).tolist()
                    ),
                    "n_chars": pa.array(
                        [len(t) for t in new_texts], type=pa.int64()
                    ),
                }
            ).cast(docs.schema)
        )
    _write(args.dst, "documents", out_docs)

    # embeddings: regenerate vectors per replica from original moments
    emb = _read(args.src, "embeddings")
    vec_ids = np.asarray(emb.column("vec_id"))
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = np.asarray(emb.column("label"))
    v_stride = int(vec_ids.max()) + 1
    mu, sd = vecs.mean(axis=0), vecs.std(axis=0)
    out_emb = [emb]
    for r in range(1, n):
        rng = np.random.default_rng(7000 + r)
        new_vecs = rng.normal(mu, sd, size=vecs.shape).astype(np.float32)
        out_emb.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_ids + r * v_stride, type=pa.int64()),
                    "embedding": pa.array(
                        [v.tolist() for v in new_vecs],
                        type=pa.list_(pa.float32()),
                    ),
                    "label": pa.array(
                        rng.choice(labels, size=len(labels)), type=pa.int32()
                    ),
                }
            ).cast(emb.schema)
        )
    _write(args.dst, "embeddings", out_emb)
    print(f"scale probe written to {args.dst} (factor {n})")


if __name__ == "__main__":
    main()
