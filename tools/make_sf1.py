"""Synthesize an sf1-scale dataset from sf0.1 for the 10x empirical scale
validation (VERDICT r5 item 4): replicate every fact/entity table FACTOR
times with consistent key remapping, preserving per-key densities and
similarity distributions, so per-query bench time ratios between sf0.1 and
sf1 measure how each plan actually grows with data.

Distribution-preserving choices (each one exists to keep a plan's work
profile honest at 10x — see SCALING.md "Empirical 10x validation"):

* **Dimensions** (`region`, `nation`) are fixed domains in the TPC-H model:
  copied unchanged, exactly like dbgen, so broadcast sides stay constant.
* **Entities** (`customer`, `supplier`, `part`, `orders`, `lineitem`,
  `events` users, `documents`, `embeddings`) are replicated with key
  stride = max(key)+1 per copy, and every foreign key is remapped with the
  SAME stride, so per-customer order counts, per-order line counts and
  per-user event counts are preserved (10x entities, not 10x-hotter keys).
* **Timestamps are kept** (TPC-H scaling grows rows inside a fixed
  calendar): per-hour densities grow 10x, distinct-hour axes stay put —
  exactly the claim SCALING.md makes for the window/grid plans.
* **Document text is deterministically token-shuffled** per copy (copy 0
  verbatim). Naive 10x duplication would turn every doc into an exact/near
  duplicate of 9 others: exact-dedup groups of 10, LSH buckets 10x denser,
  and the dedup tier's candidate-pair volume would blow up quadratically —
  measuring an artifact, not the plan. Shuffling the token multiset keeps
  lengths, vocabulary, token frequencies, lang-ID n-gram stats and quality
  ratios intact while making the copies unrelated as shingle sets.
* **Embeddings get small deterministic jitter** per copy (copy 0 verbatim,
  sigma = 2% of the per-dataset component std) for the same reason: exact
  vector copies would put 10 identical points in every ANN/near-dup bucket.

Usage: python tools/make_sf1.py [SRC_DIR] [OUT_DIR] [FACTOR]
       (defaults: /root/testdata/sf0.1 /tmp/sf1 10)
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SEED = 42


def _src(t: str) -> str:
    return f"'{SRC}/{t}.parquet'"


def _out(t: str) -> str:
    return f"{OUT}/{t}.parquet"


def stride(con: duckdb.DuckDBPyConnection, table: str, key: str) -> int:
    return con.execute(f"SELECT MAX({key}) + 1 FROM {_src(table)}").fetchone()[0]


def copy_plain(con: duckdb.DuckDBPyConnection, table: str) -> None:
    con.execute(f"COPY (SELECT * FROM {_src(table)}) TO '{_out(table)}' (FORMAT PARQUET)")


def replicate(con: duckdb.DuckDBPyConnection, table: str, select_sql: str) -> None:
    """Write FACTOR copies of `table` through a per-copy SELECT template
    containing {i} (the copy index, 0-based; copy 0 must be the identity)."""
    parts = " UNION ALL ".join(select_sql.format(i=i) for i in range(FACTOR))
    con.execute(f"COPY ({parts}) TO '{_out(table)}' (FORMAT PARQUET)")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    ck = stride(con, "customer", "c_custkey")
    sk = stride(con, "supplier", "s_suppkey")
    pk = stride(con, "part", "p_partkey")
    ok = stride(con, "orders", "o_orderkey")
    uk = stride(con, "events", "user_id")
    ek = stride(con, "events", "event_id")
    dk = stride(con, "documents", "doc_id")
    vk = stride(con, "embeddings", "vec_id")

    copy_plain(con, "region")
    copy_plain(con, "nation")

    replicate(
        con,
        "customer",
        f"""SELECT CAST(c_custkey + {{i}} * {ck} AS BIGINT) AS c_custkey,
                   'Customer#' || lpad(CAST(c_custkey + {{i}} * {ck} AS VARCHAR), 9, '0') AS c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM {_src('customer')}""",
    )
    replicate(
        con,
        "supplier",
        f"""SELECT CAST(s_suppkey + {{i}} * {sk} AS BIGINT) AS s_suppkey,
                   'Supplier#' || lpad(CAST(s_suppkey + {{i}} * {sk} AS VARCHAR), 9, '0') AS s_name,
                   s_nationkey, s_acctbal
            FROM {_src('supplier')}""",
    )
    # p_name/p_brand/p_type are categorical attributes, not identifiers:
    # kept verbatim so their domains stay fixed while parts grow 10x.
    replicate(
        con,
        "part",
        f"""SELECT CAST(p_partkey + {{i}} * {pk} AS BIGINT) AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {_src('part')}""",
    )
    replicate(
        con,
        "orders",
        f"""SELECT CAST(o_orderkey + {{i}} * {ok} AS BIGINT) AS o_orderkey,
                   CAST(o_custkey + {{i}} * {ck} AS BIGINT) AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {_src('orders')}""",
    )
    replicate(
        con,
        "lineitem",
        f"""SELECT CAST(l_orderkey + {{i}} * {ok} AS BIGINT) AS l_orderkey,
                   CAST(l_partkey + {{i}} * {pk} AS BIGINT) AS l_partkey,
                   CAST(l_suppkey + {{i}} * {sk} AS BIGINT) AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {_src('lineitem')}""",
    )
    replicate(
        con,
        "events",
        f"""SELECT CAST(event_id + {{i}} * {ek} AS BIGINT) AS event_id, ts,
                   CAST(user_id + {{i}} * {uk} AS BIGINT) AS user_id,
                   event_type, value, props
            FROM {_src('events')}""",
    )

    # documents: python-side so copies 1..N-1 get a seeded token shuffle
    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars FROM {_src('documents')} ORDER BY doc_id"
    ).fetchall()
    out_rows: dict[str, list] = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
    for i in range(FACTOR):
        for doc_id, text, lang, source, n_chars in docs:
            if i == 0:
                new_text = text
            else:
                toks = text.split(" ")
                random.Random(SEED * 1_000_003 + doc_id * 101 + i).shuffle(toks)
                new_text = " ".join(toks)
            out_rows["doc_id"].append(doc_id + i * dk)
            out_rows["text"].append(new_text)
            out_rows["lang"].append(lang)
            out_rows["source"].append(source)
            out_rows["n_chars"].append(len(new_text))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_rows["doc_id"], pa.int64()),
                "text": pa.array(out_rows["text"], pa.string()),
                "lang": pa.array(out_rows["lang"], pa.string()),
                "source": pa.array(out_rows["source"], pa.string()),
                "n_chars": pa.array(out_rows["n_chars"], pa.int64()),
            }
        ),
        _out("documents"),
    )

    # embeddings: numpy-side jitter per copy (copy 0 verbatim)
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM {_src('embeddings')} ORDER BY vec_id"
    ).fetchall()
    vec_ids = np.array([r[0] for r in emb], dtype=np.int64)
    mat = np.array([r[1] for r in emb], dtype=np.float32)
    labels = np.array([r[2] for r in emb], dtype=np.int32)
    sigma = 0.02 * float(mat.std())
    all_ids, all_vecs, all_lbls = [], [], []
    for i in range(FACTOR):
        rng = np.random.RandomState(SEED + i)
        jitter = 0.0 if i == 0 else rng.normal(0.0, sigma, mat.shape).astype(np.float32)
        all_ids.append(vec_ids + i * vk)
        all_vecs.append((mat + jitter).astype(np.float32))
        all_lbls.append(labels)
    vecs = np.concatenate(all_vecs)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(all_ids)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float32()), vecs.shape[1]
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(np.concatenate(all_lbls)),
            }
        ),
        _out("embeddings"),
    )

    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        n = con.execute(f"SELECT COUNT(*) FROM '{_out(t)}'").fetchone()[0]
        print(f"{t}: {n} rows -> {_out(t)}")


if __name__ == "__main__":
    main()
