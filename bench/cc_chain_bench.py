"""Round-count scaling of the star-alternation CC on worst-case chains.

A path graph is the adversarial input for label propagation (rounds =
diameter), and the input where the Kiveris large-star/small-star
alternation's O(log^2 n) bound actually matters. This bench builds
path graphs of 10^4..10^6 nodes DISTRIBUTED (spark.range — no driver
list), runs merlin_spark.graph.connected_components, and reports
rounds + wall + a correctness spot-check (every node must label 0).

Run: python bench/cc_chain_bench.py [--nodes 10000,100000,1000000]
Appends a markdown table to BENCH/CC_BIGSTAR_r05.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from merlin_spark.graph import connected_components  # noqa: E402
from merlin_spark.session import get_spark  # noqa: E402


def chain_edges(spark, n: int):
    """Edges (i, i+1) for i in [0, n-1): one component of diameter n-1."""
    return spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", default="10000,100000,1000000")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("cc-chain-bench", master=f"local[{os.cpu_count()}]")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in [int(x) for x in args.nodes.split(",")]:
        t0 = time.monotonic()
        labels, rounds = connected_components(chain_edges(spark, n),
                                              max_rounds=60)
        bad = labels.where(F.col("label") != 0).count()
        n_nodes = labels.count()
        wall = time.monotonic() - t0
        ok = bad == 0 and n_nodes == n
        rows.append((n, rounds, wall, ok))
        print(f"n={n}: rounds={rounds} wall={wall:.1f}s correct={ok}",
              flush=True)

    if args.out:
        import math

        with open(args.out, "a") as f:
            f.write("\n| chain nodes (diameter) | alternation rounds "
                    "| propagation rounds would be | wall (s) | correct |\n")
            f.write("|---|---|---|---|---|\n")
            for n, rounds, wall, ok in rows:
                f.write(f"| {n:,} ({n - 1:,}) | {rounds} "
                        f"(~{rounds / math.log2(n):.1f}·log2 n) "
                        f"| {n - 1:,} | {wall:.1f} | {ok} |\n")


if __name__ == "__main__":
    main()
