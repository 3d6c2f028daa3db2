"""Round-8 scale measurements (SCALE.md):

1. **Bucketed edge table A/B at the sf1 point** — `graph_pagerank_parts`
   (build-per-call: the within-basket self-join edge build rides every
   invocation) vs `graph_pagerank_from_edges` (the same oracle served
   from a `write_edge_table` src-bucketed table): one-time build cost,
   then serve-only wall + shuffle in a FRESH session (the table is
   re-registered over the cached files via DDL, so the serve run pays
   zero build).

2. **Persisted-index serving bytes-pruned rows** — for
   `bm25_topk_from_index` (term-bucket partitions) and
   `ivf_topk_from_index` (cell partitions) at 1x and 10x: bytes the
   pruned probe actually READ (event-log Input Metrics) vs the full
   index size on disk — the partition-pruning win the layout exists for.

Reuses tools/sf1_bench.py's replicated sf1 dataset (harder-than-linear
inputs by construction) and tools/scale_experiment.py's event-logged
session + metric scrapers.

Usage: python tools/scale_round8.py   # one JSON line per scenario
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.scale_experiment import make_session, shuffle_bytes  # noqa: E402
from tools.sf1_bench import SF1, SF01, WORK, build_sf1  # noqa: E402


def input_bytes(log_dir: Path) -> int:
    """Bytes Read summed over every task's Input Metrics."""
    total = 0
    for f in log_dir.rglob("*"):
        if f.is_dir() or f.name.startswith(".") or f.suffix == ".crc":
            continue
        for line in f.read_text(errors="ignore").splitlines():
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            tm = ev.get("Task Metrics") or {}
            im = tm.get("Input Metrics") or {}
            total += im.get("Bytes Read", 0)
    return total


def dir_bytes(path: Path) -> int:
    return sum(f.stat().st_size for f in path.rglob("*") if f.is_file())


def timed(name: str, tag: str, fn) -> dict:
    """Run fn(spark) in its own event-logged session; report wall,
    shuffle, input bytes."""
    log_dir = WORK / f"log_r8_{name}_{tag}"
    shutil.rmtree(log_dir, ignore_errors=True)
    spark = make_session(f"{name}-{tag}", log_dir)
    t0 = time.perf_counter()
    n_rows = fn(spark)
    dt = time.perf_counter() - t0
    spark.stop()
    rd, wr = shuffle_bytes(log_dir)
    return {
        "scenario": f"{name}_{tag}",
        "n_rows": n_rows,
        "sec": round(dt, 2),
        "shuffle_read_mb": round(rd / 1e6, 1),
        "shuffle_write_mb": round(wr / 1e6, 1),
        "input_mb": round(input_bytes(log_dir) / 1e6, 1),
    }


def pagerank_ab(sf_dir: str, tag: str) -> None:
    from usgs_lidar_spark.plans.queries import QUERIES, _cached_index_path

    # A: build-per-call (the existing headliner).
    print(
        json.dumps(
            timed(
                "pagerank_build_per_call",
                tag,
                lambda s: QUERIES["graph_pagerank_parts"](s, sf_dir).count(),
            )
        ),
        flush=True,
    )
    # B1: one-time edge-table build + first serve (cache cold).
    path, complete = _cached_index_path(sf_dir, "pr_edges", "lineitem", "")
    if complete:
        shutil.rmtree(path, ignore_errors=True)
    print(
        json.dumps(
            timed(
                "pagerank_edge_table_build_and_serve",
                tag,
                lambda s: QUERIES["graph_pagerank_from_edges"](
                    s, sf_dir
                ).count(),
            )
        ),
        flush=True,
    )
    # B2: serve-only in a FRESH session — the cached bucketed files are
    # re-registered via DDL, zero build cost.
    print(
        json.dumps(
            timed(
                "pagerank_edge_table_serve_only",
                tag,
                lambda s: QUERIES["graph_pagerank_from_edges"](
                    s, sf_dir
                ).count(),
            )
        ),
        flush=True,
    )


def triangles_ab(sf_dir: str, tag: str) -> None:
    """graph_triangles_parts (build-per-call) vs graph_triangles_from_edges
    (served from the SAME cached edge table pagerank uses — run
    pagerank_ab first so the cache is warm and this measures serve-only)."""
    from usgs_lidar_spark.plans.queries import QUERIES

    for name, qname in (
        ("triangles_build_per_call", "graph_triangles_parts"),
        ("triangles_edge_table_serve_only", "graph_triangles_from_edges"),
    ):
        print(
            json.dumps(
                timed(
                    name,
                    tag,
                    lambda s, qn=qname: QUERIES[qn](s, sf_dir).count(),
                )
            ),
            flush=True,
        )


def index_serving(sf_dir: str, tag: str) -> None:
    from usgs_lidar_spark.plans.queries import QUERIES, _cached_index_path

    for q, kind, src, marker in (
        ("search_bm25_from_index", "term_idx", "documents", "_corpus_stats"),
        ("sim_topk_from_ivf_index", "ivf_idx", "embeddings", "_centroids"),
        # Compressed ANN serving: same probes, but the at-rest index
        # stores PQ codes instead of float vectors — compare
        # index_total_mb with the full-vector ivf_idx row above.
        ("sim_topk_ivf_pq_from_index", "ivf_pq_idx", "embeddings",
         "_codebooks"),
    ):
        path, complete = _cached_index_path(sf_dir, kind, src, marker)
        if not complete:
            # Untimed build so the timed run below is serve-only.
            spark = make_session(f"{q}-build-{tag}", WORK / "log_r8_build")
            QUERIES[q](spark, sf_dir).count()
            spark.stop()
        row = timed(
            f"{q}_serve", tag, lambda s, q=q: QUERIES[q](s, sf_dir).count()
        )
        row["index_total_mb"] = round(dir_bytes(Path(path)) / 1e6, 1)
        print(json.dumps(row), flush=True)


def main() -> None:
    WORK.mkdir(parents=True, exist_ok=True)
    build_sf1()
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for sf_dir, tag in ((str(SF01), "1x"), (str(SF1), "10x")):
        if only in (None, "pagerank"):
            pagerank_ab(sf_dir, tag)
        if only in (None, "triangles"):
            triangles_ab(sf_dir, tag)
        if only in (None, "index"):
            index_serving(sf_dir, tag)


if __name__ == "__main__":
    main()
