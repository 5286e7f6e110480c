"""Materialize a deterministic key-band slice of an SF dir.

Purpose: give the sf10 oracle-wall-time holdouts a REAL cross-engine
value verdict. The constraint at sf10 was never the engine — it was
the single-box DuckDB oracle (pair-generating shingle joins run
1.5-2 h+ each; the graph oracles spill past the free disk). Slicing
the INPUT by a deterministic key band shrinks the quadratic oracle
work by the band factor squared while keeping sf10's actual row
content, id space, and text-length distribution. Both engines read
the SAME banded parquet files, so the sweep compare stays an exact
(or digest) multiset-equality check — "band-exact" is a value
verdict, not a smoke test.

Band rules (key % B == 0; plain modulo — generator ids are dense):
  documents   doc_id    % B_DOC   (the 11 text/dedup pair holdouts)
  embeddings  vec_id    % B_DOC   (curation pipeline; same factor so
                                   doc/vec-derived sizes stay aligned)
  lineitem    l_partkey % B_LI    (graph_pagerank / graph_triangle:
                                   the part<->supplier edge set is
                                   distinct (l_partkey, l_suppkey),
                                   so banding parts bands the graph)
Everything else is hardlinked (or copied) unchanged.

Usage: python tools/make_band.py SRC_DIR DST_DIR [B_DOC=4] [B_LI=8]
"""
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    b_doc = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    b_li = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    rules = {
        "documents": ("doc_id", b_doc),
        "embeddings": ("vec_id", b_doc),
        "lineitem": ("l_partkey", b_li),
    }
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.exists(d):
            os.remove(d)
        if t in rules:
            key, b = rules[t]
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{s}') WHERE {key} % {b} = 0) "
                f"TO '{d}' (FORMAT PARQUET)"
            )
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}')").fetchone()[0]
            print(f"{t}: banded {key} % {b} == 0 -> {n} rows", flush=True)
        else:
            try:
                os.link(s, d)
            except OSError:
                shutil.copyfile(s, d)
            print(f"{t}: linked", flush=True)


if __name__ == "__main__":
    main()
