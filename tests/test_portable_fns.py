"""Cross-engine equality of the portable expression builders
(functions/portable.py) on ADVERSARIAL unicode — every DuckDB oracle in
the contract rests on these primitives agreeing bit-for-bit, and the
synthetic corpus is ASCII-ish, so the nasty cases (RTL, astral plane,
NFC/NFD, Turkish dotted I, embedded controls) are otherwise untested."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.functions import portable as P  # noqa: E402

ADVERSARIAL = [
    None,  # concat-vs-|| NULL divergence trap (see hash60_duck docstring)
    "",
    " ",
    "   ",
    "\t\nmixed whitespace\r\n",
    "plain ascii words here",
    "a",
    "a b",
    "a b c",
    "a b c d e",
    "word " * 2000,  # 10k chars, long-input path
    "中文 文本 分词 测试 样例",  # CJK
    "مرحبا بالعالم هذا نص عربي",  # Arabic RTL
    "שלום עולם זה טקסט עברי",  # Hebrew RTL
    "עברית and english מעורב text",  # mixed direction
    "café résumé naïve",  # NFC composed
    "café résumé naïve",  # NFD decomposed (differs!)
    "İstanbul ısparta DİYARBAKIR",  # Turkish dotted/dotless I
    "straße STRASSE ß",
    "emoji 😀 🚀 👨‍👩‍👧‍👦 test",  # astral plane + ZWJ sequence
    "math 𝕌𝕟𝕚𝕔𝕠𝕕𝕖 chars",
    "combining à́̂ marks",
    "zero​width‌joined‍words",
    "control\x01chars\x02embedded\x03",
    "quote's \"and\" `backtick` $dollar %percent",
    "trailing space ",
    " leading space",
    "double  space  between",
    "ｆｕｌｌｗｉｄｔｈ　ｌａｔｉｎ",  # fullwidth forms + ideographic space
    "ЕДИНИЦА кириллица текст",
    "Ελληνικά κείμενο δοκιμή",
]


@pytest.fixture(scope="module")
def frames(spark):
    rows = [(i, s) for i, s in enumerate(ADVERSARIAL)]
    sdf = spark.createDataFrame(rows, "id int, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return sdf, con


def test_hash60_cross_engine(frames):
    sdf, con = frames
    import pyspark.sql.functions as F

    got = {
        r["id"]: (r["h"], r["hs"])
        for r in sdf.select(
            "id",
            F.expr(P.hash60_spark("text")).alias("h"),
            F.expr(P.hash60_spark("text", "salt")).alias("hs"),
        ).collect()
    }
    want = {
        i: (h, hs)
        for i, h, hs in con.execute(
            f"SELECT id, {P.hash60_duck('text')}, "
            f"{P.hash60_duck('text', 'salt')} FROM t"
        ).fetchall()
    }
    assert got == want


def test_words_and_shingles_cross_engine(frames):
    sdf, con = frames
    import pyspark.sql.functions as F

    w_s, w_d = P.words_spark("text"), P.words_duck("text")
    got = {
        r["id"]: (r["w"], r["sh"])
        for r in sdf.select(
            "id",
            F.expr(w_s).alias("w"),
            F.expr(P.shingles_spark(w_s)).alias("sh"),
        ).collect()
    }
    want = {
        i: (w, sh)
        for i, w, sh in con.execute(
            f"SELECT id, {w_d}, {P.shingles_duck(w_d)} FROM t"
        ).fetchall()
    }
    assert got == want


def test_simhash_cross_engine(frames):
    sdf, con = frames
    import pyspark.sql.functions as F

    got = {
        r["id"]: r["s"]
        for r in sdf.select(
            "id", F.expr(P.simhash_spark(P.words_spark("text"))).alias("s")
        ).collect()
    }
    want = dict(
        con.execute(
            f"SELECT id, {P.simhash_duck(P.words_duck('text'))} FROM t"
        ).fetchall()
    )
    assert got == want
