"""Generate an sfN-shaped synthetic dataset with the SAME schemas and
value distributions as the driver's /root/testdata tables (TESTDATA.md),
for scale factors the driver did not ship (sf1 = 10x sf0.1).

Usage: python tools/gen_sf.py <out_dir> [scale]   # scale=1.0 -> sf1

The sweep (tools/full_sweep.py) compares Spark against DuckDB on the
SAME parquet input, so a self-generated dataset gives a fully valid
cross-engine exactness check at 10x volume — the round-6 lesson being
that each decade of SF exposes bugs the smaller one cannot (the 2^53
divergence surfaced only at sf0.1). Seed differs from the driver's
(43 vs 42): the point is scale, not byte-identity with driver data.

Distribution recipes are measured from /root/testdata/sf0.1 (see the
inline constants); the documents vocabulary and part-name word lists
are sampled FROM the driver's sf0.1 tables so text analytics (stopword
ratios, langid n-grams, Zipf shape) see the same token universe.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from busy import claim as _claim

_claim("gensf")  # bench.py refuses to time while this runs (round-11 lesson)

BASE = "/root/testdata/sf0.1"  # distribution/vocab source (read-only)
SEED = 43

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
LANG_P = [0.14, 0.41, 0.15, 0.15, 0.15]
N_SOURCES = 20
EMB_DIM = 64
EMB_CLUSTERS = 10


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _round2(a: np.ndarray) -> np.ndarray:
    return np.round(a, 2)


def main() -> None:
    out_dir = sys.argv[1]
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * scale)
    n_supp = int(10_000 * scale)
    n_part = int(200_000 * scale)
    n_ord = int(1_500_000 * scale)
    n_li = int(6_000_000 * scale)
    n_ev = int(1_000_000 * scale)
    n_doc = int(50_000 * scale)
    n_emb = int(20_000 * scale)
    n_users = int(15_000 * scale)

    # region / nation: fixed-size dims, copied verbatim from the base.
    import duckdb

    con = duckdb.connect()
    for name in ("region", "nation"):
        t = con.sql(f"SELECT * FROM read_parquet('{BASE}/{name}.parquet')").arrow()
        _write(out_dir, name, t)

    # ------------------------------------------------------------ customer
    _write(
        out_dir,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()
                ),
                "c_acctbal": _round2(rng.uniform(-999.99, 9999.99, n_cust)),
                "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
            }
        ),
    )

    # ------------------------------------------------------------ supplier
    _write(
        out_dir,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()
                ),
                "s_acctbal": _round2(rng.uniform(-999.99, 9999.99, n_supp)),
            }
        ),
    )

    # ---------------------------------------------------------------- part
    # Word lists sampled from the driver's part names keep fuzzy-match /
    # name analytics in the same string universe.
    words = con.sql(
        f"SELECT DISTINCT p_name FROM read_parquet('{BASE}/part.parquet')"
    ).fetchall()
    adjs = sorted({w[0].split()[0] for w in words})
    nouns = sorted({w[0].split()[1] for w in words if len(w[0].split()) > 1})
    _write(
        out_dir,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": [
                    f"{adjs[a]} {nouns[b]}"
                    for a, b in zip(
                        rng.integers(0, len(adjs), n_part),
                        rng.integers(0, len(nouns), n_part),
                    )
                ],
                "p_brand": np.array([f"Brand#{i}" for i in range(1, 26)])[
                    rng.integers(0, 25, n_part)
                ],
                "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
                "p_size": pa.array(
                    rng.integers(1, 51, n_part).astype(np.int32), pa.int32()
                ),
                "p_retailprice": _round2(rng.uniform(900.0, 999.9, n_part)),
            }
        ),
    )

    # -------------------------------------------------------------- orders
    d0 = np.datetime64("1995-01-01")
    span_days = int((np.datetime64("2001-08-01") - d0) / np.timedelta64(1, "D"))
    odate_days = rng.integers(0, span_days + 1, n_ord)
    odate = d0 + odate_days.astype("timedelta64[D]")
    _write(
        out_dir,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
                "o_totalprice": _round2(rng.uniform(1000.0, 500000.0, n_ord)),
                "o_orderdate": pa.array(odate.astype("datetime64[us]")),
                "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
            }
        ),
    )

    # ------------------------------------------------------------ lineitem
    l_okey = rng.integers(0, n_ord, n_li)
    ship = (
        d0
        + odate_days[l_okey].astype("timedelta64[D]")
        + rng.integers(1, 96, n_li).astype("timedelta64[D]")
    )
    _write(
        out_dir,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(l_okey, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(
                    rng.integers(1, 8, n_li).astype(np.int32), pa.int32()
                ),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": _round2(rng.uniform(900.0, 105000.0, n_li)),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)],
                "l_linestatus": np.array(LINESTATUSES)[rng.integers(0, 2, n_li)],
                "l_shipdate": pa.array(ship.astype("datetime64[us]")),
            }
        ),
    )

    # -------------------------------------------------------------- events
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    month_us = 30 * 24 * 3600 * 1_000_000
    ts = t0 + rng.integers(0, month_us, n_ev).astype("timedelta64[us]")
    ts = np.sort(ts)  # driver events are time-ordered by id
    _write(
        out_dir,
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ts),
                "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
                "event_type": np.array(ETYPES)[rng.integers(0, 5, n_ev)],
                "value": _round2(rng.exponential(50.0, n_ev)),
                "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
            }
        ),
    )

    # ----------------------------------------------------------- documents
    # Vocabulary + empirical unigram frequencies from the driver's docs,
    # so stopword/langid/Zipf analytics see the same token universe.
    vocab_rows = con.sql(
        f"""
        SELECT tok, count(*) AS f FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM read_parquet('{BASE}/documents.parquet')
        ) WHERE tok <> '' GROUP BY tok ORDER BY f DESC, tok
        """
    ).fetchall()
    vocab = np.array([r[0] for r in vocab_rows])
    probs = np.array([r[1] for r in vocab_rows], dtype=np.float64)
    probs /= probs.sum()
    doc_lens = rng.integers(8, 100, n_doc)  # tokens/doc, ~ base n_chars range
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            # Near-duplicate: mutate ~10% of an earlier doc's tokens —
            # gives the dedup family real above-threshold pairs.
            src = texts[int(rng.integers(0, i))].split(" ")
            for j in range(len(src)):
                if rng.random() < 0.1:
                    src[j] = vocab[int(rng.choice(len(vocab), p=probs))]
            texts.append(" ".join(src))
        else:
            idx = rng.choice(len(vocab), size=int(doc_lens[i]), p=probs)
            texts.append(" ".join(vocab[idx]))
    _write(
        out_dir,
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": texts,
                "lang": np.array(LANGS)[
                    rng.choice(5, size=n_doc, p=np.array(LANG_P) / sum(LANG_P))
                ],
                "source": [f"src{int(s)}" for s in rng.integers(0, N_SOURCES, n_doc)],
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
    )

    # ---------------------------------------------------------- embeddings
    # Weakly-correlated clusters, like the base: expected intra-cluster
    # cosine ~ |c|^2/(|c|^2+|n|^2) ~ 0.3 with a tail crossing the 0.40
    # dedup threshold — pairs exist but are rare.
    centers = rng.normal(0.0, 0.15, (EMB_CLUSTERS, EMB_DIM))
    labels = rng.integers(0, EMB_CLUSTERS, n_emb)
    vecs = centers[labels] + rng.normal(0.0, 0.22, (n_emb, EMB_DIM))
    _write(
        out_dir,
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(vecs.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(labels.astype(np.int32), pa.int32()),
            }
        ),
    )
    print(json.dumps({"out": out_dir, "scale": scale}))


if __name__ == "__main__":
    main()
