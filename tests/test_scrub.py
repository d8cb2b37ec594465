"""PII scrub + script profile: cross-engine equality on a corpus with
multi-occurrence PII, mixed scripts, and NULL/empty degenerates."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.operators import scrub  # noqa: E402

ROWS = [
    (1, "contact alice@example.com or bob@corp.co.uk for details"),
    (2, "server at 192.168.1.10 and backup at 10.0.0.7 answered"),
    (3, "call +491701234567 tomorrow"),
    (4, "mixed: x@y.io from 1.2.3.4 dial +12025550100 now"),
    (5, "no pii here just words and numbers like 42 and 3.14"),
    (6, ""),
    (7, None),
    (8, "汉字文本和一些中文内容 ok 在一起"),  # cjk-dominant, some latin
    (9, "чисто русский текст без примесей"),
    (10, "نص عربي قصير"),
    # ADVICE r4: overlapping PII — an IPv4/phone-shaped run INSIDE an
    # email that the email pass swallows must be counted once, not twice
    (11, "ping me at user@192.168.1.10.com today"),
    (12, "+4917012345678@mail.example.org wrote in yesterday"),
]


def _engines(spark):
    sdf = spark.createDataFrame(ROWS, "doc_id bigint, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", ROWS)
    return sdf, con


def _rows(x):
    return sorted(tuple(str(v) for _, v in sorted(d.items())) for d in x)


def test_pii_scrub_cross_engine(spark):
    sdf, con = _engines(spark)
    got_rows = scrub.pii_scrub(sdf).collect()
    got = _rows(r.asDict() for r in got_rows)
    want = _rows(
        con.execute(scrub.pii_scrub_sql()).fetch_arrow_table().to_pylist()
    )
    assert got == want
    by_id = {r["doc_id"]: r for r in got_rows}
    assert by_id[1]["scrubbed"] == "contact <EMAIL> or <EMAIL> for details"
    assert by_id[1]["n_email"] == 2
    assert by_id[2]["n_ip"] == 2 and "<IP>" in by_id[2]["scrubbed"]
    assert by_id[3]["n_phone"] == 1 and "<PHONE>" in by_id[3]["scrubbed"]
    assert by_id[4]["n_email"] == 1 and by_id[4]["n_ip"] == 1 and by_id[4]["n_phone"] == 1
    assert by_id[5]["scrubbed"] == ROWS[4][1]  # untouched
    assert by_id[7]["scrubbed"] is None  # NULL propagates
    # overlapping PII counted once: the audit counts equal the actual
    # number of replacement tokens in the scrubbed text (ADVICE r4)
    assert by_id[11]["n_email"] == 1 and by_id[11]["n_ip"] == 0
    assert by_id[12]["n_email"] == 1 and by_id[12]["n_phone"] == 0
    for r in got_rows:
        if r["scrubbed"] is None:
            continue
        n_tokens = sum(
            r["scrubbed"].count(tok) for tok in ("<EMAIL>", "<IP>", "<PHONE>")
        )
        assert r["n_email"] + r["n_ip"] + r["n_phone"] == n_tokens, r


def test_script_profile_cross_engine(spark):
    sdf, con = _engines(spark)
    got_rows = scrub.script_profile(sdf).collect()
    got = _rows(r.asDict() for r in got_rows)
    want = _rows(
        con.execute(scrub.script_profile_sql()).fetch_arrow_table().to_pylist()
    )
    assert got == want
    by_id = {r["doc_id"]: r for r in got_rows}
    assert by_id[1]["main_script"] == "latin"
    assert by_id[8]["main_script"] == "cjk" and by_id[8]["latin_ratio"] > 0
    assert by_id[9]["main_script"] == "cyrillic"
    assert by_id[10]["main_script"] == "arabic"
    assert by_id[6]["main_script"] == "unknown"
    assert by_id[7]["main_script"] == "unknown"
