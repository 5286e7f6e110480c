"""Order-independent multiset digest shared by the sweep/probe
harnesses (single definition; full_sweep.py and invariance_probe.py
must hash identically for their verdicts to compose)."""
import hashlib


def digest(row_iter) -> tuple[int, int]:
    """(count, sum of per-row sha256[:16] mod 2^127) over the same
    str() per-value canonicalization the exact compare uses. Each
    value is LENGTH-PREFIXED before hashing so a value containing any
    separator byte can never collide across column boundaries
    (('a\\x1fb',) vs ('a','b') hashed differently) — the false-equal
    the exact mode's tuple compare cannot produce."""
    cnt = acc = 0
    for r in row_iter:
        h = hashlib.sha256()
        for x in r:
            b = str(x).encode("utf-8", "surrogatepass")
            h.update(len(b).to_bytes(8, "big"))
            h.update(b)
        acc = (acc + int.from_bytes(h.digest()[:16], "big")) % (1 << 127)
        cnt += 1
    return cnt, acc
