"""Synthesize a LOCAL sf1 probe tier (10x sf0.1) — originally (r7
verdict #3) for the three super-unit growth queries; extended in r11
(r10 verdict #4) to the FULL table set so the broadcast-growth audit
can classify every query's broadcast frames across TWO decades
(sf0.01 → sf0.1 → sf1), not one.

/root/testdata is read-only and the driver generates nothing past
sf0.1, so this builds the 100x point (vs sf0.01) locally:

* ``documents``  (50k rows)  — doc_prefix_filter_pairs
* ``lineitem``   (~6M rows)  — copurchase_triangle_stats, temporal_purchase_reach
* ``orders``     (1.5M rows) — temporal_purchase_reach
* ``customer``   (150k rows) — temporal_purchase_reach (segment seeds)
* ``events``     (1M rows, 15k users — linear in SF like the driver's)
* ``part``       (200k), ``supplier`` (10k) — dim-join growth
* ``embeddings`` (20k unit vectors, 64-d, 10 uniform labels — the
  sf0.1 tier is geometrically unclustered random-unit (measured:
  within-label spread 0.997 vs between-centroid 0.1, no cos>0.9
  pairs), so random unit vectors ARE the faithful marginal)
* ``nation``/``region`` — copied verbatim (fixed dimensions)

Fidelity contract (marginals measured from /root/testdata/sf0.1 and
matched here; DISCLOSED as builder-synthesized in SCALE.md §8):

* key spaces scale linearly with SF exactly as the driver's do
  (sf0.1 -> sf1: orders 150k->1.5M, parts 20k->200k, suppliers
  1k->10k, customers 15k->150k, docs 5k->50k);
* lineitems-per-order keeps the empirical sf0.1 histogram (Poisson-4
  shaped, 1..17); parts/suppliers drawn uniformly (sf0.1 top-part count
  53 vs mean 30 == uniform multinomial);
* o_orderdate uniform over the same 1995-01-01..2001-08-01 day grid,
  so temporal-reach edge timestamps densify exactly as a real 10x
  would;
* documents: uniform 10..100 words over the SAME 30-word vocabulary
  (shingle-collision density is what drives prefix-filter candidate
  growth), plus the sf0.1 dup structure: 5% of docs are a copy of an
  earlier doc with one token replaced by the rare marker token "dup";
* seeded (numpy PCG64, seed 42), deterministic output.

Usage: python scripts/gen_probe_sf1.py [out_dir]   (default /tmp/sf1_probe)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"

N_ORDERS = 1_500_000
N_CUST = 150_000
N_PARTS = 200_000
N_SUPP = 10_000
N_DOCS = 50_000
N_EVENTS = 1_000_000
N_USERS = 15_000
N_VECS = 20_000
EMB_DIM = 64

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]


def _empirical(col: str, table: str, rng: np.random.Generator, n: int):
    """Bootstrap-sample a column from the sf0.1 table (marginal fidelity
    for the columns the probe queries never touch)."""
    import duckdb

    vals = (
        duckdb.connect()
        .execute(f"SELECT {col} FROM read_parquet('{SF01}/{table}.parquet')")
        .fetch_arrow_table()
        .column(0)
        .to_numpy(zero_copy_only=False)
    )
    return vals[rng.integers(0, len(vals), n)]


def gen_orders(rng: np.random.Generator, out: str) -> np.ndarray:
    days = rng.integers(0, 2405, N_ORDERS)  # 1995-01-01 .. 2001-08-01
    base = np.datetime64("1995-01-01", "us")
    orderdate = base + days.astype("timedelta64[D]").astype("timedelta64[us]")
    tbl = pa.table(
        {
            "o_orderkey": np.arange(N_ORDERS, dtype=np.int64),
            "o_custkey": rng.integers(0, N_CUST, N_ORDERS),
            "o_orderstatus": _empirical("o_orderstatus", "orders", rng, N_ORDERS),
            "o_totalprice": _empirical("o_totalprice", "orders", rng, N_ORDERS),
            "o_orderdate": orderdate,
            "o_orderpriority": _empirical(
                "o_orderpriority", "orders", rng, N_ORDERS
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "orders.parquet"))
    return orderdate


def gen_lineitem(rng: np.random.Generator, out: str) -> None:
    import duckdb

    hist = dict(
        duckdb.connect()
        .execute(
            f"SELECT cnt, count(*) FROM (SELECT l_orderkey, count(*) cnt "
            f"FROM read_parquet('{SF01}/lineitem.parquet') GROUP BY 1) GROUP BY 1"
        )
        .fetchall()
    )
    sizes = np.array(sorted(hist), dtype=np.int64)
    probs = np.array([hist[s] for s in sizes], dtype=np.float64)
    per_order = rng.choice(sizes, N_ORDERS, p=probs / probs.sum())
    n = int(per_order.sum())
    orderkey = np.repeat(np.arange(N_ORDERS, dtype=np.int64), per_order)
    linenumber = np.concatenate([np.arange(1, k + 1) for k in per_order])
    tbl = pa.table(
        {
            "l_orderkey": orderkey,
            "l_partkey": rng.integers(0, N_PARTS, n),
            "l_suppkey": rng.integers(0, N_SUPP, n),
            "l_linenumber": linenumber,
            "l_quantity": _empirical("l_quantity", "lineitem", rng, n),
            "l_extendedprice": _empirical("l_extendedprice", "lineitem", rng, n),
            "l_discount": _empirical("l_discount", "lineitem", rng, n),
            "l_tax": _empirical("l_tax", "lineitem", rng, n),
            "l_returnflag": _empirical("l_returnflag", "lineitem", rng, n),
            "l_linestatus": _empirical("l_linestatus", "lineitem", rng, n),
            "l_shipdate": _empirical("l_shipdate", "lineitem", rng, n),
        }
    )
    pq.write_table(tbl, os.path.join(out, "lineitem.parquet"))


def gen_customer(rng: np.random.Generator, out: str) -> None:
    tbl = pa.table(
        {
            "c_custkey": np.arange(N_CUST, dtype=np.int64),
            "c_name": np.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
            "c_nationkey": rng.integers(0, 25, N_CUST),
            "c_acctbal": _empirical("c_acctbal", "customer", rng, N_CUST),
            "c_mktsegment": _empirical("c_mktsegment", "customer", rng, N_CUST),
        }
    )
    pq.write_table(tbl, os.path.join(out, "customer.parquet"))


def gen_documents(rng: np.random.Generator, out: str) -> None:
    langs = np.array(["en", "de", "zh", "es", "fr"])
    lang_p = np.array([0.412, 0.140, 0.151, 0.149, 0.148])
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(N_DOCS):
        if i > 0 and rng.random() < 0.05:  # sf0.1's 5% planted near-dups
            words = texts[rng.integers(0, i)].split(" ")
            words[rng.integers(0, len(words))] = "dup"
        else:
            k = rng.integers(10, 101)
            words = vocab[rng.integers(0, len(vocab), k)].tolist()
        texts.append(" ".join(words))
    text_arr = pa.array(texts)
    tbl = pa.table(
        {
            "doc_id": np.arange(N_DOCS, dtype=np.int64),
            "text": text_arr,
            "lang": langs[rng.choice(len(langs), N_DOCS, p=lang_p / lang_p.sum())],
            "source": np.array([f"src{i % 20}" for i in range(N_DOCS)]),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def gen_events(rng: np.random.Generator, out: str) -> None:
    # ts: the driver's 30-day window (2024-01-01..2024-01-30), densified
    # 10x — day/hour grids identical to sf0.1 so per-day/per-hour
    # aggregate frames stay BOUNDED while the corpus grows (exactly the
    # distinction the broadcast-growth audit classifies)
    span_us = 30 * 86_400 * 1_000_000
    base = np.datetime64("2024-01-01", "us")
    ts = base + np.sort(rng.integers(0, span_us, N_EVENTS)).astype(
        "timedelta64[us]"
    )
    tbl = pa.table(
        {
            "event_id": np.arange(N_EVENTS, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, N_USERS, N_EVENTS),
            "event_type": _empirical("event_type", "events", rng, N_EVENTS),
            "value": _empirical("value", "events", rng, N_EVENTS),
            "props": _empirical("props", "events", rng, N_EVENTS),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def gen_part(rng: np.random.Generator, out: str) -> None:
    keys = np.arange(N_PARTS, dtype=np.int64)
    tbl = pa.table(
        {
            "p_partkey": keys,
            "p_name": _empirical("p_name", "part", rng, N_PARTS),
            "p_brand": _empirical("p_brand", "part", rng, N_PARTS),
            "p_type": _empirical("p_type", "part", rng, N_PARTS),
            "p_size": _empirical("p_size", "part", rng, N_PARTS),
            # driver pattern (all SFs): 900 + (key % 1000)/10 — the
            # price RANGE saturates at [900, 999.9] while keys grow,
            # so range-derived frames (skyline bands) stay bounded;
            # an unbounded 900+0.1*key here faked a linear band-count
            # jump at sf1 (caught by the r11 three-tier audit)
            "p_retailprice": np.round(900.0 + (keys % 1000) / 10.0, 1),
        }
    )
    pq.write_table(tbl, os.path.join(out, "part.parquet"))


def gen_supplier(rng: np.random.Generator, out: str) -> None:
    tbl = pa.table(
        {
            "s_suppkey": np.arange(N_SUPP, dtype=np.int64),
            "s_name": np.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
            "s_nationkey": _empirical(
                "s_nationkey", "supplier", rng, N_SUPP
            ).astype(np.int32),
            "s_acctbal": _empirical("s_acctbal", "supplier", rng, N_SUPP),
        }
    )
    pq.write_table(tbl, os.path.join(out, "supplier.parquet"))


def gen_embeddings(rng: np.random.Generator, out: str) -> None:
    X = rng.standard_normal((N_VECS, EMB_DIM)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": np.arange(N_VECS, dtype=np.int64),
            "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
            "label": rng.integers(0, 10, N_VECS).astype(np.int32),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def copy_fixed_dims(out: str) -> None:
    import shutil

    for t in ("nation", "region"):
        shutil.copy(
            os.path.join(SF01, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_probe"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_orders(rng, out)
    gen_lineitem(rng, out)
    gen_customer(rng, out)
    gen_documents(rng, out)
    gen_events(rng, out)
    gen_part(rng, out)
    gen_supplier(rng, out)
    gen_embeddings(rng, out)
    copy_fixed_dims(out)
    for f in sorted(os.listdir(out)):
        p = os.path.join(out, f)
        print(f, os.path.getsize(p) // 1_000_000, "MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
