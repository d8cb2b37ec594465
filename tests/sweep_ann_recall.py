#!/usr/bin/env python
"""Recall@k sweep for the ANN operators (VERDICT r2 item 5): multiprobe
LSH over (n_planes, radius) and IVF over n_probe, against the exact
brute-force baseline, at sf0.1 (5000 vectors).  Results merge into
tests/goldens/ann_recall.json; the contract pins the chosen operating
point (see `chosen` in the golden).  Run manually like make_goldens.py:

    python tests/sweep_ann_recall.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CVOCR_SWEEP_SF_DIR", "/root/testdata/sf0.1")
NQ, K = 20, 5


def _topk_map(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(exact, approx):
    hits = total = 0
    for q, gold in exact.items():
        hits += len(gold & approx.get(q, set()))
        total += len(gold)
    return round(hits / total, 4)


def main() -> None:
    from cvocr_spark.operators import ivf
    from cvocr_spark.operators.similarity import (
        _probe_flips,
        cosine_topk,
        lsh_ann_multiprobe_topk,
    )
    from cvocr_spark.session import build_session, ensure_shipped

    spark = build_session(app="ann-sweep", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = _topk_map(cosine_topk(emb, n_queries=NQ, k=K).collect())

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "goldens", "ann_recall.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    sweep = {}
    for n_planes in (4, 8, 12):
        for radius in (1, 2):
            got = _topk_map(
                lsh_ann_multiprobe_topk(
                    emb, n_queries=NQ, k=K, n_planes=n_planes, radius=radius
                ).collect()
            )
            frac = round(len(_probe_flips(n_planes, radius)) / 2**n_planes, 4)
            key = f"lsh_planes{n_planes}_r{radius}"
            sweep[key] = {"recall": _recall(exact, got), "probed_fraction": frac}
            print(key, sweep[key], flush=True)
    for n_probe in (1, 2, 4):
        got = _topk_map(
            ivf.ivf_ann_topk(emb, n_probe=n_probe, n_queries=NQ, topk=K).collect()
        )
        key = f"ivf_nprobe{n_probe}_of{ivf.IVF_K}"
        sweep[key] = {
            "recall": _recall(exact, got),
            "probed_fraction": round(n_probe / ivf.IVF_K, 4),
        }
        print(key, sweep[key], flush=True)

    # chosen operating point: cheapest config with recall@5 >= 0.8
    # (falls back to max recall if none qualifies).  Caveat, recorded
    # here because it shapes the whole curve: the synthetic embeddings
    # are near-uniform on the sphere (no cluster structure), so probed
    # fraction trades ~linearly with recall and 0.8 recall costs ~50%
    # of the corpus; real embedding corpora concentrate far better and
    # the same configs prune much harder at equal recall.
    good = {k: v for k, v in sweep.items() if v["recall"] >= 0.8}
    pool = good or sweep
    chosen = min(
        pool.items(), key=lambda kv: (kv[1]["probed_fraction"], -kv[1]["recall"])
    )
    data["sweep_sf"] = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    data["sweep_nq_k"] = [NQ, K]
    data["sweep"] = sweep
    data["chosen"] = {"config": chosen[0], **chosen[1]}
    data["chosen_note"] = (
        "synthetic embeddings are near-uniform (no cluster structure); "
        "recall-vs-probed_fraction is ~linear here, unlike real corpora"
    )
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print("chosen:", data["chosen"])


if __name__ == "__main__":
    main()
