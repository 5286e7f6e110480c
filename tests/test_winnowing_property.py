"""Winnowing algorithm properties, checked against a pure-Python
reference implementation of the MOSS selection rule (Schleimer/
Wilkerson/Aiken, SIGMOD 2003) on crafted documents:

1. Exact agreement with the reference fingerprint sets.
2. The density guarantee: two documents sharing a token run of
   length >= k + w - 1 share at least one identical fingerprint hash.
3. Position robustness: prepending a paragraph shifts positions but
   the fingerprints selected inside the shared tail keep their hashes.
"""

from __future__ import annotations

import re

from data_pipeline_with_hdfs_sql_integration_spark.functions.textfns import BASE, MOD
from data_pipeline_with_hdfs_sql_integration_spark.plans.overlap import (
    WINNOW_K,
    WINNOW_W,
    _winnow_fp_rows,
)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _hash_str(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * BASE + ord(ch)) % MOD
    return h


def _ref_winnow(text: str) -> set[tuple[int, int]]:
    """Reference winnowing: set of (hash, gram_pos) fingerprints."""
    th = [_hash_str(t) for t in _tokens(text)]
    grams = []
    for i in range(len(th) - WINNOW_K + 1):
        g = 0
        for x in th[i : i + WINNOW_K]:
            g = (g * BASE + x) % MOD
        grams.append((g, i))
    if not grams:
        return set()

    def pick(window):
        best = window[0]
        for g, p in window[1:]:
            if g < best[0] or (g == best[0] and p > best[1]):
                best = (g, p)
        return best

    if len(grams) < WINNOW_W:
        return {pick(grams)}
    return {
        pick(grams[s : s + WINNOW_W]) for s in range(len(grams) - WINNOW_W + 1)
    }


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "short doc"),
    (3, "one two three four"),  # exactly k tokens -> single gram
    (4, ""),  # no tokens
    (5, "repeat repeat repeat repeat repeat repeat repeat repeat"),
    # 6 shares a >= k+w-1 = 7-token run with 0, embedded elsewhere.
    (6, "completely different opening words quick brown fox jumps over the lazy dog and unrelated trailing content"),
    # 7 is 1 with a prepended paragraph (pure shift).
    (7, "some brand new leading paragraph text here alpha beta gamma delta epsilon zeta eta theta iota kappa"),
]


def _spark_fps(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = _winnow_fp_rows(docs).collect()
    out: dict[int, set[tuple[int, int]]] = {i: set() for i, _ in DOCS}
    for r in rows:
        out[r["doc_id"]].add((r["fp_hash"], r["fp_pos"]))
    return out


def test_matches_pure_python_reference(spark):
    got = _spark_fps(spark)
    for doc_id, text in DOCS:
        assert got[doc_id] == _ref_winnow(text), f"doc {doc_id}"


def test_shared_run_guarantee(spark):
    """Docs 0 and 6 share the 8-token run 'quick brown fox jumps over
    the lazy dog' (>= k+w-1 = 7): winnowing must select at least one
    identical hash in both."""
    got = _spark_fps(spark)
    h0 = {h for h, _ in got[0]}
    h6 = {h for h, _ in got[6]}
    assert h0 & h6, "density guarantee violated"


def test_prefix_shift_keeps_tail_hashes(spark):
    """Doc 7 = doc 1 with a prepended paragraph: every hash selected
    in doc 1 must still be selected in doc 7 (positions shift, hash
    set of the shared tail survives) — doc 1 is ONE shared run, so the
    guarantee applies to all of it."""
    got = _spark_fps(spark)
    h1 = {h for h, _ in got[1]}
    h7 = {h for h, _ in got[7]}
    # Every doc-1 window of w consecutive grams exists intact inside
    # doc 7's tail, so every doc-1 selection must reappear (doc 7 only
    # ADDS boundary windows, it cannot remove selections).
    assert h1 <= h7, (h1 - h7)


def test_empty_and_short_docs(spark):
    got = _spark_fps(spark)
    assert got[4] == set()  # no tokens -> no grams -> no fingerprints
    assert len(got[3]) == 1  # single gram -> its own fingerprint
    assert got[2] == set()  # 2 tokens < k -> no grams
