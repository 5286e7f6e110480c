"""text_bpe_learn_merges has no SQL oracle (greedy stateful iteration);
this pure-Python reference implementation IS its oracle: same
tokenization, same pair counting over every occurrence, same
(count desc, pair asc) argmax, same greedy leftmost merge fold."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def _reference_merges(texts: list[str], rounds: int) -> list[tuple]:
    seqs = []
    for text in texts:
        for tok in (t for t in re.split(r"[^a-z0-9]+", text.lower()) if t):
            if len(tok) >= 2:
                seqs.append(list(tok))
    out = []
    for rnd in range(1, rounds + 1):
        counts: Counter = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = a + b
        out.append((rnd, a, b, merged, n))
        new_seqs = []
        for s in seqs:
            ns: list[str] = []
            for sym in s:
                if ns and ns[-1] == a and sym == b:
                    ns[-1] = merged
                else:
                    ns.append(sym)
            new_seqs.append(ns)
        seqs = new_seqs
    return out


def test_learned_merges_match_reference(spark):
    from data_pipeline_with_hdfs_sql_integration_spark.plans.text_analysis import (
        BPE_MERGE_ROUNDS,
        text_bpe_learn_merges,
    )

    texts = pq.read_table(f"{SF_DIR}/documents.parquet").column("text").to_pylist()
    expected = _reference_merges(texts, BPE_MERGE_ROUNDS)
    got = [
        (r["round"], r["sym_a"], r["sym_b"], r["merged"], r["n_occurrences"])
        for r in text_bpe_learn_merges(spark, SF_DIR).collect()
    ]
    assert got == expected
    assert len(got) == BPE_MERGE_ROUNDS  # corpus is rich enough for all rounds
