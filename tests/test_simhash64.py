"""Production-width signature tests: the 52-bit/k=128 minhash scheme
and the 64-bit simhash cross-validated against an INDEPENDENT pure
hashlib implementation (not just the co-designed DuckDB oracle), plus
the Hamming-neighborhood behavior that makes simhash64 a real near-dup
operator."""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.functions import portable as P  # noqa: E402
from cvocr_spark.operators import dedup, simhash64  # noqa: E402


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# -- independent reference implementations (hashlib, no SQL) -----------------


def _py_minhash128(text: str) -> list[int]:
    words = text.split(" ")
    if len(words) >= 3:
        shingles = {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
    else:
        shingles = {" ".join(words)}
    pairs = []
    for s in sorted(shingles):
        h = hashlib.md5(s.encode()).hexdigest()
        pairs.append((int(h[0:13], 16), int(h[13:26], 16)))
    return [min(h1 + j * h2 for (h1, h2) in pairs) for j in range(P.MINHASH_WIDE_K)]


def _py_simhash64(text: str) -> tuple[int, int]:
    words = text.split(" ")
    votes = [0] * 64
    m32 = (1 << 32) - 1
    for w in words:
        lo = int(hashlib.md5(f"s64lo:{w}".encode()).hexdigest()[:15], 16) & m32
        hi = int(hashlib.md5(f"s64hi:{w}".encode()).hexdigest()[:15], 16) & m32
        for b in range(32):
            votes[b] += 1 if (lo >> b) & 1 else -1
            votes[32 + b] += 1 if (hi >> b) & 1 else -1
    slo = sum(1 << b for b in range(32) if votes[b] > 0)
    shi = sum(1 << b for b in range(32) if votes[32 + b] > 0)
    return slo, shi


def test_minhash_k128_matches_pure_python(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "completely different words forming another document body for testing",
        "short one",
    ]
    df = _docs(spark, list(enumerate(texts)))
    got = {r["doc_id"]: r["sig_digest"] for r in simhash64.minhash_k128_digest(df).collect()}
    for i, t in enumerate(texts):
        mins = _py_minhash128(t)
        want = hashlib.md5(",".join(str(m) for m in mins).encode()).hexdigest()
        assert got[i] == want, f"doc {i}: k=128 scheme diverged from hashlib reference"
        # bigint-safety at production width: every intermediate < 2^63
        assert max(mins) < 2**63


def test_simhash64_matches_pure_python(spark):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve",
    ]
    df = _docs(spark, list(enumerate(texts)))
    got = {
        r["doc_id"]: (r["sim_lo"], r["sim_hi"])
        for r in simhash64.simhash64_signatures(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_simhash64(t), f"doc {i}: simhash64 diverged"
        assert 0 <= got[i][0] <= (1 << 32) and 0 <= got[i][1] <= (1 << 32)


def test_simhash64_neardup_finds_small_edits(spark):
    base = ("word%d " % i for i in range(60))
    base = "".join(base).strip()
    edited = base.replace("word30", "changed30")  # 1-of-60 words changed
    df = _docs(spark, [(1, base), (2, edited), (3, "an unrelated short document entirely")])
    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash64.simhash64_neardup_pairs(df, max_hamming=10).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 10
    assert all(3 not in k for k in pairs)


def test_simhash64_exact_copies_hamming_zero(spark):
    docs = dedup.with_injected_dups(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    )
    pairs = simhash64.simhash64_neardup_pairs(docs).collect()
    zero = [r for r in pairs if r["hamming"] == 0]
    assert zero, "injected exact copies must appear at hamming 0"
    byk = {(r["a"], r["b"]): r["hamming"] for r in pairs}
    for (a, b), h in byk.items():
        if b == a + dedup.DUP_OFFSET:
            assert h == 0
