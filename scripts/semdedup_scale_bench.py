"""SemDeDup at corpus scale over the persisted .ann_scale IVF layouts.

Two measurements, mirroring the dense-ANN validation discipline
(`scripts/ann_scale_bench.py`, BASELINE.md):

1. **Tier equivalence at 20k**: the GEMM pair tier (`method="arrow"`)
   must produce the byte-identical decision frame as the Catalyst-expr
   oracle path on the same layout (the expr form is what the DuckDB
   oracle checks at sf scale; this extends that chain to the bulk tier).
2. **Corpus-scale wall time at 1M x 128-d**: end-to-end decisions
   (pairs -> components -> keeper choice) from the persisted posting
   lists, at a few thresholds, reporting pair counts / dup-group sizes /
   kept fraction and wall seconds.

Usage: python scripts/semdedup_scale_bench.py [--n 1000000]
       [--thresholds 0.05,0.1,0.15] [--skip-parity]
Results merge into .ann_scale/semdedup_n{n}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chroma_spark.ann.ivf import read_ivf  # noqa: E402
from chroma_spark.operators import dedup as D  # noqa: E402
from chroma_spark.session import get_spark  # noqa: E402

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ann_scale")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--parity-n", type=int, default=20_000)
    # the .ann_scale corpus is a low-intrinsic-dim mixture: within-cluster
    # pair distances have median ~0.05 and 0.1%-quantile ~0.008 (measured),
    # so useful dedup thresholds sit well below a real embedding space's —
    # an adversarially DENSE pair regime, which is what we want to stress
    ap.add_argument("--thresholds", default="0.005,0.01,0.02")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()
    thresholds = [float(t) for t in args.thresholds.split(",")]

    spark = get_spark("semdedup-scale")
    out_path = os.path.join(ROOT, f"semdedup_n{args.n}.json")
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}

    if not args.skip_parity:
        cents, posts = read_ivf(spark, os.path.join(ROOT, f"ivf_n{args.parity_n}"))
        t = thresholds[0]
        expr = {
            tuple(r)
            for r in D.semdedup_from_postings(posts, cents, t).collect()
        }
        arrow = {
            tuple(r)
            for r in D.semdedup_from_postings(posts, cents, t, method="arrow").collect()
        }
        results["parity"] = {
            "n": args.parity_n,
            "threshold": t,
            "rows": len(expr),
            "identical": expr == arrow,
        }
        print(f"parity@{args.parity_n} thr={t}: rows={len(expr)} identical={expr == arrow}", flush=True)
        assert expr == arrow

    cents, posts = read_ivf(spark, os.path.join(ROOT, f"ivf_n{args.n}"))
    posts = posts.select("centroid_id", "id", "embedding")
    assigned = D.primary_assignment(posts, cents)
    for t in thresholds:
        t0 = time.time()
        pairs_n = D.semdedup_pairs_arrow(assigned, t).count()
        t_pairs = time.time() - t0
        t0 = time.time()
        out = D.semdedup_from_postings(posts, cents, t, method="arrow")
        agg = out.agg(
            F.count("*").alias("rows"),
            F.sum(F.col("keep").cast("long")).alias("kept"),
            F.countDistinct(F.when(~F.col("keep"), F.col("group"))).alias("dup_groups"),
        ).collect()[0]
        t_full = time.time() - t0
        row = {
            "threshold": t,
            "pairs": int(pairs_n),
            "rows": int(agg.rows),
            "kept": int(agg.kept),
            "dup_groups": int(agg.dup_groups or 0),
            "pairs_s": round(t_pairs, 1),
            "decisions_s": round(t_full, 1),
        }
        results.setdefault("scale", {})[str(t)] = row
        print(f"n={args.n} thr={t}: pairs={pairs_n} kept={agg.rows and agg.kept}/{agg.rows} "
              f"dup_groups={agg.dup_groups} pairs_wall={t_pairs:.1f}s decisions_wall={t_full:.1f}s", flush=True)

    os.makedirs(ROOT, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
