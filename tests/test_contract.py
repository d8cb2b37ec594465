"""Mirror of the driver's correctness gate, run locally and STRICTER:
every queries() entry vs its oracle_sql() via DuckDB with EXACT value
equality (the driver hashes values, so exact equality here implies the
driver's hash match)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CVOCR_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def contract():
    from cvocr_spark.contract import build_contract

    return build_contract()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows(rows):
    # repr-keyed sort: stable for mixed None/str/num; both sides use the
    # same key so zip-compare of the actual tuples is exact
    return sorted((tuple(_norm(v) for v in r) for r in rows), key=repr)


def _query_names():
    from cvocr_spark.contract import build_contract

    return sorted(build_contract().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, contract, duck, spark):
    fn, sql = contract[name]
    sdf = fn(spark, SF_DIR)
    cols = sorted(sdf.columns)
    srows = _rows([tuple(r[c] for c in cols) for r in sdf.collect()])
    assert len(srows) > 0, f"{name}: Spark query returned no rows"
    if sql is None:
        return  # rows-only check, like the driver's weaker path
    ddf = duck.execute(sql).fetch_arrow_table()
    dcols = sorted(ddf.column_names)
    assert cols == dcols, f"{name}: column names differ: {cols} vs {dcols}"
    dd = ddf.to_pylist()
    drows = _rows([tuple(r[c] for c in cols) for r in dd])
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} vs oracle {len(drows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(srows, drows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first 3: {mismatches[:3]}"
    )


def test_union_distinct_cross_engine(duck, spark):
    """Set-op capability gate (§2g) — left the checked contract in r5
    (traded for the composite curation_manifest slot), stays pinned
    cross-engine here like the other traded demos."""
    from cvocr_spark.operators import relational

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(r["v"] for r in relational.union_distinct(docs).collect())
    want = sorted(
        d["v"]
        for d in duck.execute(relational.UNION_DISTINCT_SQL)
        .fetch_arrow_table()
        .to_pylist()
    )
    assert got == want and len(got) > 0
