"""Freeze golden extraction outputs (SURVEY §5 item 1; FIXTURES.md §2).

Run manually ONCE per intentional kernel-behavior change:
    python tests/make_goldens.py
Goldens are committed; CI never regenerates them implicitly — they are
the byte-identical contract the north_rule checks.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvocr_spark.fixtures import gen_pages_table  # noqa: E402
from cvocr_spark.kernel import extract  # noqa: E402

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("block_id", pa.int32()),
            ("char_start", pa.int32()),
            ("char_end", pa.int32()),
            ("cls", pa.string()),
        ]
    )
)

GOLDEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("spans", SPAN_TYPE),
        ("n_blocks", pa.int32()),
        ("score", pa.float64()),
    ]
)


def make(sf: str, out_dir: str) -> str:
    pages = gen_pages_table(f"/root/testdata/sf{sf}/documents.parquet")
    urls, texts, spans, n_blocks, scores = [], [], [], [], []
    for i in range(pages.num_rows):
        r = extract(pages.column("html")[i].as_py())
        urls.append(pages.column("url")[i].as_py())
        texts.append(r.text)
        spans.append(
            [
                {"block_id": b, "char_start": s, "char_end": e, "cls": c}
                for (b, s, e, c) in r.spans
            ]
        )
        n_blocks.append(r.n_blocks)
        scores.append(r.score)
    t = pa.table(
        [
            pa.array(urls),
            pa.array(texts),
            pa.array(spans, SPAN_TYPE),
            pa.array(n_blocks, pa.int32()),
            pa.array(scores, pa.float64()),
        ],
        schema=GOLDEN_SCHEMA,
    )
    path = os.path.join(out_dir, f"golden_sf{sf}.parquet")
    pq.write_table(t, path)
    print(f"wrote {path}: {t.num_rows} rows")
    return path


if __name__ == "__main__":
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
    os.makedirs(here, exist_ok=True)
    make("0.001", here)
    make("0.01", here)
