"""Contention-free anchors for the expensive bench queries.

The in-suite bench numbers drift with suite position (documented ambient
band 28-35 s); per the round-5 verdict each expensive query also gets an
ISOLATED warm timing — one query alone in the session, 1 cold + N warm
iterations, median reported — recorded next to the suite numbers in
BASELINE.md so budget discussions have a contention-free anchor.

Usage: python scripts/isolated_bench.py [query ...]   (default: the known
contention-sensitive set). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chroma_spark.registry import QUERIES  # noqa: E402
from chroma_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT = [
    "rank_rrf",
    "ann_quantized_topk",
    "dedup_minhash_lsh",
    "rank_hybrid_sparse",
    "search_full",
]
WARM = 4


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0
    spark = get_spark("isolated-bench")
    out = {}
    for name in names:
        fn = QUERIES[name].fn
        fn(spark, SF_DIR).collect()  # cold: plan compile + JIT, discarded
        times = []
        for _ in range(WARM):
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            times.append(time.time() - t0)
        times.sort()
        out[name] = {
            "warm_median_s": round(times[WARM // 2], 2),
            "warm_min_s": round(times[0], 2),
            "warm_max_s": round(times[-1], 2),
        }
        print(f"# {name}: median {out[name]['warm_median_s']}s "
              f"[{out[name]['warm_min_s']}, {out[name]['warm_max_s']}]")
    print(json.dumps({"sf_dir": SF_DIR, "loadavg_at_start": round(load1, 2),
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
