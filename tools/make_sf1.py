"""Synthesize a deterministic sf1 dataset (10x sf0.1) for the round-5
whole-surface bench certification (verdict item 1).

/root/testdata is read-only and tops out at sf0.1, so sf1 lives under
the repo at testdata/sf1 (git-ignored).  Construction, per table:

  region/nation        copied verbatim (fixed dimensions in TPC-H).
  customer/supplier/   10 key-offset copies: every key space scales
  part/orders/         10x with referential integrity preserved
  lineitem/events      (custkey' = custkey + copy*15000, orderkey' =
                       orderkey + copy*150000, ...).  Value columns
                       repeat per copy — marginal distributions,
                       group cardinalities and join fan-outs all match
                       a native sf1, which is what the bench plans see.
  documents            50k FRESH word-salad docs drawn from the sf0.1
                       corpus vocabulary with empirical word/length/
                       lang/source marginals (numpy seed 4242), plus
                       the corpus's ~0.16% exact-duplicate rate.
                       Fresh (not copied) so near-dup/minhash queries
                       keep their true pair structure instead of every
                       doc gaining 9 trivial twins.
  embeddings           20k fresh vectors from the sf0.1 per-label
                       cluster means/stds (64-dim, labels 0..9) —
                       preserves the cluster geometry IVF/ANN rely on.

Usage: python tools/make_sf1.py [--out testdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"
COPIES = 10


def scale_tpch(con: duckdb.DuckDBPyConnection, out: str) -> None:
    con.execute(f"""
        COPY (SELECT * FROM '{SRC}/region.parquet')
        TO '{out}/region.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT * FROM '{SRC}/nation.parquet')
        TO '{out}/nation.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT c_custkey + cp.c * 15000 AS c_custkey,
                 printf('Customer#%09d', c_custkey + cp.c * 15000) AS c_name,
                 c_nationkey, c_acctbal, c_mktsegment
          FROM '{SRC}/customer.parquet', (SELECT range AS c FROM range({COPIES})) cp
        ) TO '{out}/customer.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT s_suppkey + cp.c * 1000 AS s_suppkey,
                 printf('Supplier#%09d', s_suppkey + cp.c * 1000) AS s_name,
                 s_nationkey, s_acctbal
          FROM '{SRC}/supplier.parquet', (SELECT range AS c FROM range({COPIES})) cp
        ) TO '{out}/supplier.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT p_partkey + cp.c * 20000 AS p_partkey,
                 p_name, p_brand, p_type, p_size, p_retailprice
          FROM '{SRC}/part.parquet', (SELECT range AS c FROM range({COPIES})) cp
        ) TO '{out}/part.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT o_orderkey + cp.c * 150000 AS o_orderkey,
                 o_custkey + cp.c * 15000 AS o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM '{SRC}/orders.parquet', (SELECT range AS c FROM range({COPIES})) cp
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT l_orderkey + cp.c * 150000 AS l_orderkey,
                 l_partkey + cp.c * 20000 AS l_partkey,
                 l_suppkey + cp.c * 1000 AS l_suppkey,
                 l_linenumber, l_quantity, l_extendedprice, l_discount,
                 l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM '{SRC}/lineitem.parquet', (SELECT range AS c FROM range({COPIES})) cp
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (
          SELECT event_id + cp.c * 100000 AS event_id, ts,
                 user_id + cp.c * 1500 AS user_id,
                 event_type, value, props
          FROM '{SRC}/events.parquet', (SELECT range AS c FROM range({COPIES})) cp
        ) TO '{out}/events.parquet' (FORMAT PARQUET)""")


def fresh_documents(con: duckdb.DuckDBPyConnection, out: str) -> None:
    rows = con.execute(
        f"SELECT text, lang, source FROM '{SRC}/documents.parquet'"
    ).fetchall()
    rng = np.random.RandomState(4242)
    # empirical marginals
    vocab: dict[str, int] = {}
    lengths = []
    for text, _, _ in rows:
        words = text.split()
        lengths.append(len(words))
        for w in words:
            vocab[w] = vocab.get(w, 0) + 1
    words = np.array(sorted(vocab))
    freqs = np.array([vocab[w] for w in words], dtype=np.float64)
    freqs /= freqs.sum()
    langs = np.array([r[1] for r in rows])
    sources = np.array([r[2] for r in rows])
    n = len(rows) * COPIES
    lens = rng.choice(np.array(lengths), size=n)
    doc_lang = rng.choice(langs, size=n)
    doc_src = rng.choice(sources, size=n)
    texts = []
    for i in range(n):
        texts.append(" ".join(rng.choice(words, size=lens[i], p=freqs)))
    # the corpus's exact-duplicate rate (~0.16%): overwrite a trailing
    # slice with earlier docs' text
    n_dup = int(round(n * (1 - 4992 / 5000)))
    for j in range(n_dup):
        texts[n - 1 - j] = texts[j * 7 % (n // 2)]
    con.register("docs_py", con.from_df(__import__("pandas").DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": doc_lang,
        "source": doc_src,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })))
    con.execute(f"COPY (SELECT * FROM docs_py) TO '{out}/documents.parquet'"
                " (FORMAT PARQUET)")


def fresh_embeddings(con: duckdb.DuckDBPyConnection, out: str) -> None:
    rows = con.execute(
        f"SELECT embedding, label FROM '{SRC}/embeddings.parquet'"
    ).fetchall()
    rng = np.random.RandomState(2424)
    vecs = np.array([r[0] for r in rows], dtype=np.float64)
    labels = np.array([r[1] for r in rows])
    n = len(rows) * COPIES
    uniq = np.unique(labels)
    means = {lb: vecs[labels == lb].mean(axis=0) for lb in uniq}
    stds = {lb: vecs[labels == lb].std(axis=0) for lb in uniq}
    counts = np.array([(labels == lb).sum() for lb in uniq], dtype=np.float64)
    new_labels = rng.choice(uniq, size=n, p=counts / counts.sum())
    dim = vecs.shape[1]
    out_vecs = np.empty((n, dim), dtype=np.float32)
    for i, lb in enumerate(new_labels):
        out_vecs[i] = (means[lb]
                       + rng.standard_normal(dim) * stds[lb]).astype(np.float32)
    import pandas as pd
    con.register("emb_py", con.from_df(pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v for v in out_vecs],
        "label": new_labels.astype(np.int32),
    })))
    con.execute(
        f"""COPY (SELECT vec_id, embedding::FLOAT[] AS embedding, label
                  FROM emb_py)
            TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata", "sf1"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    scale_tpch(con, args.out)
    fresh_documents(con, args.out)
    fresh_embeddings(con, args.out)
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        n = con.execute(
            f"SELECT count(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n:,}")


if __name__ == "__main__":
    main()
