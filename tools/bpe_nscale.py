#!/usr/bin/env python
"""BPE trainer wall-vs-merge-count measurement (round-11 judge ask #5).

The r11 sf1->sf10 row certified the trainer is vocabulary-bound in
CORPUS size (1.1x wall on 10x data); real tokenizers run thousands of
merges, so the other axis matters too: does per-merge cost stay flat as
N grows, or does lineage/persist overhead accumulate? This times
queries.llm._bpe_train_loop at several N on one SF and reports
per-merge cost:

    PYTHONPATH=. python tools/bpe_nscale.py [--sf-dir /root/testdata/sf0.1]
                                            [--merges 8,32,64]
                                            [--out SCALE_CHECK_BPE_NMERGES.json]

Expected shape: per-merge cost ~constant (each iteration is one
vocab-sized pair aggregate + a 1-row argmax collect + a narrow
projection, with per-iteration persist keeping lineage depth at 1 and
the previous iteration's cache explicitly unpersisted). A growing
per-merge cost would mean batching non-overlapping top-k merges per
iteration — the standard trick — is warranted; a flat one means the
loop already scales in N.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        ),
    )
    ap.add_argument("--merges", default="8,32,64")
    ap.add_argument(
        "--out",
        default=os.path.join(_REPO_ROOT, "SCALE_CHECK_BPE_NMERGES.json"),
    )
    args = ap.parse_args()
    ns = [int(x) for x in args.merges.split(",")]

    from sales_data_pipeline_spark.queries.base import release_persisted
    from sales_data_pipeline_spark.queries.llm import _bpe_train_loop
    from sales_data_pipeline_spark.session import build_session

    spark = build_session("bpe_nscale")
    spark.read.parquet(f"{args.sf_dir}/documents.parquet").limit(1).count()

    rows = []
    for n in ns:
        # warm + measured, min-of-2 (the bench noise-floor convention);
        # caches dropped between runs so every run trains cold
        best = None
        merges_done = 0
        for _ in range(2):
            release_persisted()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            merges = _bpe_train_loop(spark, args.sf_dir, n)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
            merges_done = len(merges)
        rows.append(
            {
                "n_merges": n,
                "merges_done": merges_done,
                "wall_s": round(best, 2),
                "per_merge_s": round(best / max(1, merges_done), 3),
            }
        )
        print(rows[-1], flush=True)

    base = rows[0]
    result = {
        "sf_dir": args.sf_dir,
        "rows": rows,
        "per_merge_growth_last_vs_first": round(
            rows[-1]["per_merge_s"] / base["per_merge_s"], 2
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
