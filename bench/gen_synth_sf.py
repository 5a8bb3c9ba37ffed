"""Generate an sf1.0-SHAPED dataset under /tmp/synthdata/sf1.0 for
performance validation only (never written to /root/testdata; content
is NOT oracle-comparable to the driver's generator — distributions and
layout mimic the real tables so query cost shapes are realistic)."""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = "/tmp/synthdata/sf1.0"
os.makedirs(OUT, exist_ok=True)
rng = np.random.default_rng(4242)

def write(name, table, row_group_size=1 << 20):
    pq.write_table(table, f"{OUT}/{name}.parquet", row_group_size=row_group_size)
    md = pq.ParquetFile(f"{OUT}/{name}.parquet").metadata
    print(name, table.num_rows, "rows", md.num_row_groups, "rgs",
          os.path.getsize(f"{OUT}/{name}.parquet") // (1 << 20), "MiB")

# tiny dims: copy as-is
for t in ("region", "nation"):
    tb = pq.read_table(f"/root/testdata/sf0.1/{t}.parquet")
    write(t, tb)

N_CUST, N_ORD, N_LI = 150_000, 1_500_000, 6_000_000
N_EV, N_DOC, N_EMB = 1_000_000, 50_000, 8_000
N_SUPP, N_PART = 10_000, 200_000

# supplier / part
write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
    "s_name": [f"Supplier#{i}" for i in range(N_SUPP)],
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
    "s_acctbal": np.round(rng.uniform(-999, 9999, N_SUPP), 2),
}))
write("part", pa.table({
    "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
    "p_name": [f"part {i} name" for i in range(N_PART)],
    "p_brand": [f"Brand#{i % 25}" for i in range(N_PART)],
    "p_type": [f"TYPE {i % 150}" for i in range(N_PART)],
    "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
    "p_retailprice": np.round(rng.uniform(900, 2100, N_PART), 2),
}))

write("customer", pa.table({
    "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
    "c_name": [f"Customer#{i}" for i in range(N_CUST)],
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
    "c_acctbal": np.round(rng.uniform(-999, 9999, N_CUST), 2),
    "c_mktsegment": pa.array(
        np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])[
            rng.integers(0, 5, N_CUST)
        ]
    ),
}))

d0 = np.datetime64("1995-01-01")
span_o = int((np.datetime64("2001-08-01") - d0) / np.timedelta64(1, "s"))
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD), pa.int64()),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
    "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, N_ORD)]),
    "o_totalprice": np.round(rng.uniform(900, 500_000, N_ORD), 2),
    "o_orderdate": pa.array(
        d0 + rng.integers(0, span_o, N_ORD).astype("timedelta64[s]"),
        pa.timestamp("us")),
    "o_orderpriority": pa.array(
        np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])[
            rng.integers(0, 5, N_ORD)
        ]
    ),
}))

span_l = int((np.datetime64("2001-11-04") - d0) / np.timedelta64(1, "s"))
write("lineitem", pa.table({
    "l_orderkey": pa.array(rng.integers(0, N_ORD, N_LI), pa.int64()),
    "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
    "l_linenumber": pa.array(rng.integers(1, 8, N_LI), pa.int32()),
    "l_quantity": rng.integers(1, 51, N_LI).astype("float64"),
    "l_extendedprice": np.round(rng.uniform(900, 105_000, N_LI), 2),
    "l_discount": np.round(rng.uniform(0, 0.1, N_LI), 2),
    "l_tax": np.round(rng.uniform(0, 0.08, N_LI), 2),
    "l_returnflag": pa.array(np.array(["N", "A", "R"])[rng.integers(0, 3, N_LI)]),
    "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, N_LI)]),
    "l_shipdate": pa.array(
        d0 + rng.integers(0, span_l, N_LI).astype("timedelta64[s]"),
        pa.timestamp("us")),
}))

t0 = np.datetime64("2024-01-01T00:00:00")
span_e = int((np.datetime64("2024-01-31T00:00:00") - t0) / np.timedelta64(1, "us"))
offs = np.sort(rng.integers(0, span_e, N_EV))
write("events", pa.table({
    "event_id": pa.array(np.arange(N_EV), pa.int64()),
    "ts": pa.array(t0 + offs.astype("timedelta64[us]"), pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, 15_000, N_EV), pa.int64()),
    "event_type": pa.array(
        np.array(["click", "view", "purchase", "signup", "error"])[
            rng.integers(0, 5, N_EV)
        ]
    ),
    "value": np.round(rng.uniform(0, 560, N_EV), 2),
    "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, N_EV)],
}))

VOCAB = np.array(
    "batch part spark line column order small sort fast value scan a hash "
    "slow group agg filter query big key window row table stream merge data "
    "customer join vector dup the".split()
)
n_words = rng.integers(8, 65, N_DOC)
texts = [" ".join(VOCAB[rng.integers(0, len(VOCAB), k)]) for k in n_words]
# a sprinkle of exact duplicates like the real corpus (~0.3%)
for i in rng.integers(0, N_DOC, N_DOC // 300):
    texts[int(i)] = texts[int(i) // 2]
write("documents", pa.table({
    "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
    "text": texts,
    "lang": pa.array(np.array(["en", "zh", "fr", "es", "de"])[rng.integers(0, 5, N_DOC)]),
    "source": pa.array([f"src{int(s)}" for s in rng.integers(0, 20, N_DOC)]),
    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
}))

emb = rng.standard_normal((N_EMB, 64)).astype("float32")
emb /= np.linalg.norm(emb, axis=1, keepdims=True)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
    "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    "label": pa.array(rng.integers(0, 10, N_EMB), pa.int32()),
}))

open(f"{OUT}/_DONE", "w").close()
print("done ->", OUT)
