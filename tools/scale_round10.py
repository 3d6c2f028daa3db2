"""Round-10 scale measurements (SCALE.md): the three r8-requested rows
still outstanding after r9, at 1x (sf0.1) vs 10x (tools/sf1_bench.py's
token-rotated replicated documents/embeddings — the harder-than-linear
corpus the other rows use).

What each scenario is meant to prove:
  * pipe_negative_samples — per-positive candidate generation is a
    seeded-hash equi-join against the id universe; shuffle carries
    (anchor, candidate) id pairs only, never text, so volume scales
    with positives * k, not corpus bytes.
  * sim_knn_classify — the label vote is the brute-force cosine top-k
    against a BROADCAST query matrix: corpus-side map work plus one
    per-query-key aggregate; shuffle is ~n_queries * k rows.
  * pipe_temperature_mix — sqrt-temperature source mixing: two passes
    over per-source counts (bounded by #sources) + one map-side keep
    decision per row; the only data-sized shuffle is NONE (map-only
    keep + broadcast quota table).

Method identical to tools/scale_round8c.py: warm second run reported
(first pays whole-stage-codegen JIT), results fully materialized via an
all-column xxhash64 aggregate (a bare count() lets Catalyst prune the
interesting expressions — the round-8 lesson), pmod to stay in int64
under ANSI mode.

Second wave (pass names as argv to run a subset):
  * text_rules_filter — map-only rule expressions; zero shuffle at any
    size, wall tracks the scan.
  * pipe_end_to_end_v6 — the ingest composition: election + rollup
    shuffles carry digests/counts; reassembled text shuffles once.
  * pipe_dsir_select — one feature pass (64-row weight table), the
    scoring join is a broadcast, the rank cut shuffles (score, id)
    pairs only.

Usage: python tools/scale_round10.py [name ...]  # one JSON line each
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
    "pipe_negative_samples",
    "sim_knn_classify",
    "pipe_temperature_mix",
    "text_rules_filter",
    "pipe_end_to_end_v6",
    "pipe_dsir_select",
]


def run(name: str, sf_dir: str, tag: str) -> dict:
    from pyspark.sql import functions as F

    from usgs_lidar_spark.plans.queries import QUERIES

    def body(spark) -> int:
        df = QUERIES[name](spark, sf_dir)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))
            ).alias("h"),
        ).collect()[0]
        return int(row["n"])

    return timed(name, tag, body)


def main() -> None:
    names = sys.argv[1:] or SCENARIOS
    build_sf1()
    # Throwaway session: the first make_session in a process pays the
    # JVM/Python gateway launch.
    timed("warmup", "0", lambda spark: spark.range(10).count())
    for name in names:
        for tag, sf in (("1x", str(SF01)), ("10x", str(SF1))):
            run(name, sf, tag)  # JIT warm, discarded
            print(json.dumps(run(name, sf, tag)), flush=True)


if __name__ == "__main__":
    main()
