#!/usr/bin/env python3
"""Synthesize an N-x scaled copy of a testdata corpus for scaling probes.

Driver-side tooling only (python3 + duckdb + numpy; never a library dep).
Scales the three tables the scale-claim operators read — documents,
embeddings, lineitem — by replicating with content perturbation chosen so
per-row statistics and *relative* structure match the original corpus:

- documents: copy k keeps ids disjoint (doc_id + N*k) and appends a
  copy-specific digit to EVERY whitespace token. Token and char counts
  grow marginally, token COUNT is unchanged (mix budgets behave
  identically), shingle sets across copies are disjoint (cross-copy
  Jaccard ~ 0), so the near-duplicate pair population replicates
  per-copy — duplicate DENSITY stays constant as the corpus grows, like
  a real crawl, instead of every row gaining mult-1 artificial twins.
- embeddings: copy k adds deterministic gaussian noise (per-component sigma=0.07,
  seed=k) and renormalizes: cos(v, v') ~ 0.87, i.e. perturbed copies
  stay in their source's cluster region (labels preserved) without
  being near-duplicates of it, so LSH/IVF bucket occupancy scales the
  way a growing real corpus would.
- lineitem: copy k offsets l_orderkey; measure columns are untouched,
  so the value distribution quantile operators see is IDENTICAL at
  every scale.

Copy 0 is verbatim: the 1x corpus is a strict subset of every scale.

Usage: make_scale_corpus.py SRC_DIR OUT_DIR MULT
"""
import sys
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def scale_documents(con, src, out, mult):
    # offset by max(doc_id)+1, not row count: sparse ids would collide
    # between copies under an n-based offset (lineitem/events do the same)
    n, stride = con.execute(
        f"SELECT count(*), max(doc_id) + 1 "
        f"FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()
    parts = []
    for k in range(mult):
        if k == 0:
            parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM read_parquet('{src}/documents.parquet')")
        else:
            # append digit(s) k to every token; recompute n_chars to keep
            # the corpus invariant n_chars == len(text)
            parts.append(
                f"SELECT doc_id + {stride * k} AS doc_id, "
                f"regexp_replace(text, '(\\S+)', '\\1{k}', 'g') AS text, "
                f"lang, source, "
                f"len(regexp_replace(text, '(\\S+)', '\\1{k}', 'g'))::BIGINT "
                f"AS n_chars "
                f"FROM read_parquet('{src}/documents.parquet')")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' "
        f"(FORMAT parquet)")
    print(f"documents: {n} -> {n * mult}")


def scale_embeddings(src, out, mult):
    t = pq.read_table(f"{src}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    label = t.column("label").to_numpy()
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = emb.shape
    ids, labels, vecs = [], [], []
    for k in range(mult):
        if k == 0:
            v = emb
        else:
            rng = np.random.RandomState(1000 + k)
            v = emb + rng.randn(n, dim).astype(np.float32) * 0.07
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
        ids.append(vec_id + (int(vec_id.max()) + 1) * k)
        labels.append(label)
        vecs.append(v.astype(np.float32))
    out_t = pa.table({
        "vec_id": np.concatenate(ids),
        "embedding": pa.array([row for v in vecs for row in v.tolist()],
                              type=pa.list_(pa.float32())),
        "label": np.concatenate(labels),
    })
    pq.write_table(out_t, f"{out}/embeddings.parquet")
    print(f"embeddings: {n} -> {n * mult}")


def order_stride(con, src):
    """Shared l_orderkey/o_orderkey copy offset: lineitem and orders must
    shift by the SAME stride so the fact-fact join keys keep matching at
    every scale (the bucketed-join probe joins them)."""
    ml = con.execute(
        f"SELECT max(l_orderkey) "
        f"FROM read_parquet('{src}/lineitem.parquet')").fetchone()[0]
    mo = con.execute(
        f"SELECT max(o_orderkey) "
        f"FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
    return max(ml, mo) + 1


def scale_orders(con, src, out, mult, stride):
    n = con.execute(
        f"SELECT count(*) "
        f"FROM read_parquet('{src}/orders.parquet')").fetchone()[0]
    parts = [
        f"SELECT * REPLACE (o_orderkey + {stride * k} AS o_orderkey) "
        f"FROM read_parquet('{src}/orders.parquet')"
        for k in range(mult)]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/orders.parquet' "
        f"(FORMAT parquet)")
    print(f"orders: {n} -> {n * mult}")


def scale_lineitem(con, src, out, mult, stride):
    n = con.execute(
        f"SELECT count(*) "
        f"FROM read_parquet('{src}/lineitem.parquet')").fetchone()[0]
    parts = [
        f"SELECT l_orderkey + {stride * k} AS l_orderkey, "
        f"l_partkey, l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, "
        f"l_linestatus, l_shipdate "
        f"FROM read_parquet('{src}/lineitem.parquet')"
        for k in range(mult)]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/lineitem.parquet' "
        f"(FORMAT parquet)")
    print(f"lineitem: {n} -> {n * mult}")


def scale_events(con, src, out, mult):
    """Copy k offsets event_id AND user_id: the corpus grows by adding
    USERS (per-user history length stays constant — how an event stream
    actually grows), so keyed-window operators (SCD2, sessionize) see
    constant per-key work and more keys. ts/type/value distributions are
    identical at every scale."""
    n, maxu, maxe = con.execute(
        f"SELECT count(*), max(user_id), max(event_id) "
        f"FROM read_parquet('{src}/events.parquet')").fetchone()
    parts = [
        f"SELECT event_id + {(maxe + 1) * k} AS event_id, ts, "
        f"user_id + {(maxu + 1) * k} AS user_id, event_type, value, props "
        f"FROM read_parquet('{src}/events.parquet')"
        for k in range(mult)]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/events.parquet' "
        f"(FORMAT parquet)")
    print(f"events: {n} -> {n * mult}")


def scale_customer(con, src, out, mult):
    """Copy k offsets c_custkey; every attribute column is untouched, so
    the quasi-identifier GROUPS the k-anonymity probe aggregates over
    stay fixed while their occupancy grows x mult — group population
    constant, rows x mult, like a customer base growing within the same
    demographic bands."""
    n, maxc = con.execute(
        f"SELECT count(*), max(c_custkey) "
        f"FROM read_parquet('{src}/customer.parquet')").fetchone()
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/customer.parquet')"
    ).fetchall()]
    rest = ", ".join(c for c in cols if c != "c_custkey")
    parts = [
        f"SELECT c_custkey + {(maxc + 1) * k} AS c_custkey, {rest} "
        f"FROM read_parquet('{src}/customer.parquet')"
        for k in range(mult)]
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/customer.parquet' "
        f"(FORMAT parquet)")
    print(f"customer: {n} -> {n * mult}")


def main():
    src, out, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    scale_documents(con, src, out, mult)
    scale_embeddings(src, out, mult)
    stride = order_stride(con, src)
    scale_lineitem(con, src, out, mult, stride)
    scale_orders(con, src, out, mult, stride)
    scale_events(con, src, out, mult)
    scale_customer(con, src, out, mult)


if __name__ == "__main__":
    main()
