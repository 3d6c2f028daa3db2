"""Round-8 continuation scale measurements (SCALE.md): the new text-tier
operators at 1x (sf0.1) vs 10x (the sf1 replicated documents from
tools/sf1_bench.py — token-rotated replicas, so chunk/bigram domains are
HARDER than independent data: rotation preserves most interior n-grams,
densifying cross-doc duplicates and keeping the pair/bigram vocabulary
nearly fixed while corpus bytes grow 10x).

What each scenario is meant to prove:
  * dedup_chunk_reassemble — election shuffles digests+positions, and
    reassembly shuffles each SURVIVING chunk's text once; at 10x the
    replicas' chunks mostly lose election, so shuffle grows ~with the
    winner set, not the corpus.
  * text_bigram_surprisal — the Zipf-head context join is broadcast
    (two-tier); shuffled volume ~ tail slots + per-doc sums.
  * text_bpe_learn_merges — corpus is scanned ONCE to build (word,
    freq); each of the 4 merge rounds is bounded by |vocab|, which the
    rotation keeps ~fixed, so 10x corpus should cost ~1x per-round work
    on top of the one bigger scan.
  * text_skipgram_pairs — the one shuffle is the map-combined pair
    vocabulary (~fixed under rotation), not corpus positions.

Usage: python tools/scale_round8c.py   # one JSON line per scenario
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.scale_round8 import timed  # noqa: E402
from tools.sf1_bench import SF1, SF01, build_sf1  # noqa: E402

SCENARIOS = [
    "dedup_chunk_reassemble",
    "text_bigram_surprisal",
    "text_bpe_learn_merges",
    "text_skipgram_pairs",
    # second wave: the leakage audit (10x rides the DENSER replicated
    # pair graph) and the map-only bootstrap (B x explode, one
    # replicate-keyed aggregate — wall should track the scan).
    "pipe_split_leakage",
    "stats_poisson_bootstrap",
    # third wave: the exact training reductions — Gram shuffles d² per
    # PARTITION (never O(rows)); the k-means iteration's shuffles are
    # k·dim per round regardless of corpus size.
    "sim_embedding_gram",
    "sim_kmeans_two_steps",
]


def run(name: str, sf_dir: str, tag: str) -> dict:
    from pyspark.sql import functions as F

    from usgs_lidar_spark.plans.queries import QUERIES

    def body(spark) -> int:
        df = QUERIES[name](spark, sf_dir)
        # Full-value materialization: a bare count() lets Catalyst prune
        # the expensive expressions (reassembled text, surprisal sums)
        # right out of the plan — hashing every column defeats that.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # pmod keeps the ANSI-mode SUM inside int64 at any row count
            F.sum(F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))).alias("h"),
        ).collect()[0]
        return int(row["n"])

    return timed(name, tag, body)


def main() -> None:
    build_sf1()
    # Throwaway session: the first make_session in a process pays the
    # JVM/Python gateway launch; without this the 1x rows (always first)
    # carry the startup and read SLOWER than 10x.
    timed("warmup", "0", lambda spark: spark.range(10).count())
    for name in SCENARIOS:
        for tag, sf in (("1x", str(SF01)), ("10x", str(SF1))):
            # Two sessions per scenario, report the second: the first
            # execution of a heavy expression chain pays whole-stage
            # codegen JIT (observed 2-3x on the first 1x run), which is
            # warmup, not scaling behavior.
            run(name, sf, tag)
            res = run(name, sf, tag)
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
