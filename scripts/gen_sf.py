#!/usr/bin/env python3
"""Deterministic scale-up of the driver testdata for bench sweeps.

Builds an sfN-style directory from /root/testdata/sf0.1 by writing R
key-shifted replicas of every table (R=10 -> sf1). Replica construction
models how a web corpus actually grows -- more distinct content, not the
same content repeated:

- lineitem/orders/customer/part/supplier: disjoint key-shifted sub-stars
  (join fan-outs preserved exactly; replica r shifts each key by
  r * (max_key + 1)).
- events: event_id/user_id shifted, timestamps unchanged (a bigger corpus
  fills the same time range more densely).
- documents: doc_id shifted; replica r > 0 suffixes EVERY token with '~r'.
  The map is a bijection on token strings, so within-replica Jaccard is
  EXACTLY preserved (near-dup structure per replica identical to sf0.1)
  while cross-replica token sets are disjoint by construction -> Jaccard
  = 0 for every cross-replica pair, provably below every threshold even
  for the unblocked ops (q22 minhash / q23 simhash). An earlier cut
  suffixed only tokens with hash % 3 == 0; with docs of 6-31 distinct
  tokens the realized per-doc suffix fraction ranged 0-0.54, so measured
  cross-replica Jaccard ranged 0.30-1.0 (mean 0.58) -- f = 0 docs were
  byte-identical across replicas, breaking the separation claim in the
  tail. Replica r > 0 also gets a per-replica source tag (10x the corpus
  = more sources of the same size distribution, so (lang, source)
  blocking keeps block sizes constant -- the blocking scale model, not a
  100x within-block pair blow-up).
- embeddings: vec_id shifted; replica r > 0 gets a deterministic per-
  coordinate sign-flip pattern. What this does and does NOT guarantee:
  within-replica cosines are exactly preserved (both vectors flip the
  same signs), and cross-replica cosines concentrate near 0 (sigma =
  1/sqrt(64) = 1/8), so NO cross-replica pair reaches the near-dup
  regime (measured at R=10: zero cross-replica pairs at tau >= 0.8;
  max same-base 0.77, max different-base 0.64). But tau = 0.4 is only
  3.2 sigma at dim 64, so the random-geometry tail (~7e-4 per pair)
  over ~180M cross-replica pairs yields ~90k pairs >= 0.4 (measured
  89,409) -- for ANY construction: 0.4 at this dim is inside the
  random tail, not a near-dup threshold. q25's exact pair set at
  tau = 0.4 therefore grows ~quadratically with corpus size BY
  GEOMETRY (measured 920 -> 98,609 pairs at 10x rows), which is the
  by-spec quadratic regime BENCH.md documents.

Everything is deterministic (seeded by the replica index); no RNG state.

Usage: python3 scripts/gen_sf.py <outDir> [replicas=10]
"""
import hashlib
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def copy_table(con, name, out_dir):
    con.sql(f"COPY (SELECT * FROM '{SRC}/{name}.parquet') TO "
            f"'{out_dir}/{name}.parquet' (FORMAT PARQUET)")


def replicate_sql(con, name, out_dir, replicas, select_for):
    parts = " UNION ALL ".join(select_for(r) for r in range(replicas))
    con.sql(f"COPY ({parts}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)")


def main(out_dir, replicas):
    con = duckdb.connect()
    for t in ["region", "nation"]:
        copy_table(con, t, out_dir)

    C, O, P, S, E, U, D, V = (15000, 150000, 20000, 1000, 100000, 1500,
                              5000, 2000)

    replicate_sql(con, "customer", out_dir, replicas, lambda r: f"""
      SELECT c_custkey + {r * C} AS c_custkey, c_name, c_nationkey,
             c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'""")
    replicate_sql(con, "supplier", out_dir, replicas, lambda r: f"""
      SELECT s_suppkey + {r * S} AS s_suppkey, * EXCLUDE (s_suppkey)
      FROM '{SRC}/supplier.parquet'""")
    replicate_sql(con, "part", out_dir, replicas, lambda r: f"""
      SELECT p_partkey + {r * P} AS p_partkey, * EXCLUDE (p_partkey)
      FROM '{SRC}/part.parquet'""")
    replicate_sql(con, "orders", out_dir, replicas, lambda r: f"""
      SELECT o_orderkey + {r * O} AS o_orderkey,
             o_custkey + {r * C} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{SRC}/orders.parquet'""")
    replicate_sql(con, "lineitem", out_dir, replicas, lambda r: f"""
      SELECT l_orderkey + {r * O} AS l_orderkey,
             l_partkey + {r * P} AS l_partkey,
             l_suppkey + {r * S} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM '{SRC}/lineitem.parquet'""")
    replicate_sql(con, "events", out_dir, replicas, lambda r: f"""
      SELECT event_id + {r * E} AS event_id, ts,
             user_id + {r * U} AS user_id, event_type, value, props
      FROM '{SRC}/events.parquet'""")

    def doc_select(r):
        if r == 0:
            return f"SELECT * FROM '{SRC}/documents.parquet'"
        return f"""
      SELECT doc_id + {r * D} AS doc_id,
             array_to_string(list_transform(str_split(text, ' '),
               x -> x || '~{r}'), ' ') AS text,
             lang, source || '~{r}' AS source,
             CAST(length(array_to_string(list_transform(str_split(text, ' '),
               x -> x || '~{r}'), ' ')) AS BIGINT) AS n_chars
      FROM '{SRC}/documents.parquet'"""
    replicate_sql(con, "documents", out_dir, replicas, doc_select)

    # embeddings: numpy sign-flip per replica (seeded from the replica index
    # via sha256 -- deterministic, no RNG state)
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = tbl.column("vec_id").to_numpy()
    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    label = tbl.column("label").to_numpy()
    dim = emb.shape[1]
    ids, vecs, labels = [], [], []
    for r in range(replicas):
        seed_bytes = hashlib.sha256(f"graft-sf-replica-{r}".encode()).digest()
        bits = np.unpackbits(np.frombuffer(
            (seed_bytes * ((dim // 256) + 1))[: (dim + 7) // 8], dtype=np.uint8))[:dim]
        flips = np.where(r == 0, 1.0, (1.0 - 2.0 * bits)).astype(np.float32)
        ids.append(vec_id + r * V)
        vecs.append(emb * flips)
        labels.append(label)
    out = pa.table({
        "vec_id": np.concatenate(ids),
        "embedding": pa.array(list(np.concatenate(vecs)),
                              type=pa.list_(pa.float32())),
        "label": np.concatenate(labels).astype(np.int32),
    })
    pq.write_table(out, f"{out_dir}/embeddings.parquet")

    for t in ["lineitem", "orders", "customer", "events", "documents",
              "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    import os
    out = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    main(out, reps)
