"""Property-based tests (hypothesis): operator invariants on random
inputs — the test dimension the reference lacks entirely (SURVEY.md §5).

Kept to few examples per property: each example round-trips through a
Spark job, so the budget goes to input diversity, not repetition.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from usgs_lidar_spark.functions import mercator as M
from usgs_lidar_spark.operators.asof import asof_join
from usgs_lidar_spark.operators.voxel import voxel_downsample

SET = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    xs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=60
    ),
    res=st.floats(min_value=0.1, max_value=1e4, allow_nan=False),
)
@settings(**SET)
def test_voxel_partition_of_input(spark, xs, res):
    """Voxelization is a partition: counts sum to the input size, every
    barycenter lies inside its voxel's bounds, keys are non-negative."""
    df = spark.createDataFrame(pd.DataFrame({"x": xs}))
    out = voxel_downsample(df, ["x"], [res], round_digits=None).collect()
    assert sum(r["n_points"] for r in out) == len(xs)
    xmin = min(xs)
    for r in out:
        assert r["ix"] >= 0
        lo, hi = xmin + r["ix"] * res, xmin + (r["ix"] + 1) * res
        # barycenter of members lies in [lo, hi] (closed upper edge for fp slack)
        assert lo - 1e-6 <= r["cx"] <= hi + 1e-6


@given(
    lons=st.lists(
        st.floats(min_value=-179.9, max_value=179.9, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    lats=st.lists(
        st.floats(min_value=-84.9, max_value=84.9, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
)
@settings(**SET)
def test_mercator_roundtrip_property(spark, lons, lats):
    n = min(len(lons), len(lats))
    df = spark.createDataFrame(
        pd.DataFrame({"lon": lons[:n], "lat": lats[:n]})
    )
    out = df.select(
        "lon",
        "lat",
        M.x_to_lon(M.lon_to_x("lon")).alias("lon2"),
        M.y_to_lat(M.lat_to_y("lat")).alias("lat2"),
    ).collect()
    for r in out:
        assert math.isclose(r["lon"], r["lon2"], abs_tol=1e-9)
        assert math.isclose(r["lat"], r["lat2"], abs_tol=1e-9)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=0,
        max_size=25,
    ),
)
@settings(**SET)
def test_asof_matches_bruteforce(spark, left, right):
    """asof_join == the brute-force definition: max right.ts <= left.ts
    per key (value of the max-ts row, ties broken by larger tie-break)."""
    ldf = spark.createDataFrame(
        pd.DataFrame(left, columns=["k", "t"]).assign(
            rid=range(len(left))
        )
    )
    rdf = spark.createDataFrame(
        pd.DataFrame(right, columns=["k", "t", "v"]).drop_duplicates(),
        schema="k long, t long, v long",
    )
    got = {
        r["rid"]: r["asof_t"]
        for r in asof_join(
            ldf, rdf, ["k"], "t", ["v"], tie_break="v", how="left"
        ).collect()
    }
    rows = rdf.collect()
    for lk, lt, rid in [(a, b, i) for i, (a, b) in enumerate(left)]:
        cand = [r["t"] for r in rows if r["k"] == lk and r["t"] <= lt]
        want = max(cand) if cand else None
        assert got[rid] == want, (lk, lt, cand)


@given(
    toks=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
    budget=st.integers(min_value=1, max_value=300),
)
@settings(**SET)
def test_pack_sequences_invariants(spark, toks, budget):
    """Packing is lossless and gapless on any input, under BOTH forms:
    n_streams=1 (one totally-ordered stream) chains starts globally, and
    the default Lehmer-bucket streams chain starts within each
    pack_stream; offsets stay inside the budget, split flags fire iff
    the doc actually crosses its pack's boundary, and the total token
    count is preserved either way."""
    from usgs_lidar_spark.operators.pipeline import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], ["doc_id", "toks"]
    )
    rows = sorted(
        pack_sequences(df, "doc_id", "toks", budget=budget, n_streams=1)
        .collect(),
        key=lambda r: r["doc_id"],
    )
    expect_start = 0
    for r in rows:
        assert r["token_start"] == expect_start
        assert 0 <= r["pack_offset"] < budget
        assert r["pack_id"] == r["token_start"] // budget
        crosses = r["token_start"] + r["n_tokens"] > (r["pack_id"] + 1) * budget
        assert r["split_across"] == crosses
        expect_start += r["n_tokens"]
    assert expect_start == sum(toks)

    # default bucketed form: same invariants per stream
    bucketed = sorted(
        pack_sequences(df, "doc_id", "toks", budget=budget, n_streams=5)
        .collect(),
        key=lambda r: r["doc_id"],
    )
    starts: dict[int, int] = {}
    for r in bucketed:
        s = r["pack_stream"]
        assert r["token_start"] == starts.get(s, 0)
        assert 0 <= r["pack_offset"] < budget
        assert r["pack_id"] == r["token_start"] // budget
        crosses = r["token_start"] + r["n_tokens"] > (r["pack_id"] + 1) * budget
        assert r["split_across"] == crosses
        starts[s] = r["token_start"] + r["n_tokens"]
    assert sum(starts.values()) == sum(toks)


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=50, unique=True
    ),
    seed=st.integers(min_value=0, max_value=1000),
)
@settings(**SET)
def test_split_partition_property(spark, ids, seed):
    """Hash-splitting is a partition of the input (each id in exactly one
    split) and seed-stable: the same ids under the same seed land in the
    same split regardless of row order."""
    from usgs_lidar_spark.operators.pipeline import split_by_hash

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    out = split_by_hash(df, "doc_id", seed=seed).collect()
    assert len(out) == len(ids)
    first = {r["doc_id"]: r["split"] for r in out}
    again = split_by_hash(
        spark.createDataFrame([(i,) for i in reversed(ids)], ["doc_id"]),
        "doc_id",
        seed=seed,
    ).collect()
    assert {r["doc_id"]: r["split"] for r in again} == first


@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-3.0, max_value=3.0, allow_nan=False),   # dlon
            st.floats(min_value=-84.0, max_value=84.0, allow_nan=False),  # lat
        ),
        min_size=1,
        max_size=12,
    ),
    zone=st.integers(min_value=1, max_value=60),
    south=st.booleans(),
)
@settings(**SET)
def test_tmerc_roundtrip_property(spark, pts, zone, south):
    """UTM forward∘inverse is identity to ~1e-9 deg for ANY in-zone point
    in ANY of the 120 UTM zones — the per-zone generalization of the
    fixed-zone roundtrip test."""
    from usgs_lidar_spark.functions import tmerc

    epsg = (32700 if south else 32600) + zone
    lon0 = 6 * zone - 183
    df = spark.createDataFrame(
        [(lon0 + dlon, lat) for dlon, lat in pts], "lon double, lat double"
    )
    E, N = tmerc.utm_forward("lon", "lat", epsg)
    lon_rt, lat_rt = tmerc.utm_inverse(E, N, epsg)
    rows = df.select(
        (F.col("lon") - lon_rt).alias("dlon"),
        (F.col("lat") - lat_rt).alias("dlat"),
    ).collect()
    for r in rows:
        assert abs(r["dlon"]) < 1e-9 and abs(r["dlat"]) < 1e-9, (epsg, r)


@given(
    ids=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    seed=st.integers(min_value=0, max_value=100),
    n_shards=st.integers(min_value=1, max_value=7),
)
@settings(**SET)
def test_global_shuffle_permutation_property(spark, ids, seed, n_shards):
    """For ANY long ids (full range, negatives included): the hash key is
    in [0, 2^31-1) and matches pure-Python wide arithmetic; shards lie in
    [0, n_shards); positions are a dense 1..k per shard — i.e. the
    operator is a permutation into shards, never dropping or duplicating
    a row, on any input."""
    from usgs_lidar_spark.operators.pipeline import (
        _LEHMER_A,
        _LEHMER_M,
        global_shuffle,
        portable_hash_long,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = global_shuffle(df, "doc_id", n_shards, seed).select(
        "doc_id", "shard", "shard_pos", portable_hash_long("doc_id", seed).alias("k")
    ).collect()
    assert len(rows) == len(ids)

    def ref_key(i):
        x = (i % _LEHMER_M + 1 + seed) % _LEHMER_M
        for _ in range(2):
            x = (x * _LEHMER_A) % _LEHMER_M
        return x

    per_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["k"] < _LEHMER_M and r["k"] == ref_key(r["doc_id"])
        assert 0 <= r["shard"] < n_shards and r["shard"] == r["k"] % n_shards
        per_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for ps in per_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta eps zeta".split()),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=4),
)
@settings(**SET)
def test_substring_spans_bounds(spark, texts, n):
    """For any corpus: dup coverage never exceeds the token count, the
    dup fraction stays in [0, 1], dup gram counts never exceed total
    grams, and docs shorter than n report zero grams."""
    from usgs_lidar_spark.operators.dedup import duplicate_ngram_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in duplicate_ngram_spans(df, n=n).collect():
        assert 0 <= r["dup_tokens_covered"] <= r["n_tokens"]
        assert 0.0 <= r["dup_token_fraction"] <= 1.0
        assert 0 <= r["n_dup_grams"] <= r["n_grams"]
        if r["n_tokens"] < n:
            assert r["n_grams"] == 0 and r["n_dup_grams"] == 0


@given(
    und=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            st.integers(min_value=1, max_value=8),
        ).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=10,
        unique=True,
    ),
    iters=st.integers(min_value=1, max_value=3),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_mass_and_positivity(spark, und, iters):
    """On any symmetrized graph: ranks are positive, total mass stays
    within integer-rounding slack of 1.0, and the result is invariant
    under edge-list repartitioning."""
    from usgs_lidar_spark.operators.graph import pagerank_fixed

    edges = list({(a, b) for a, b in und} | {(b, a) for a, b in und})
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["rank_scaled"] for r in pagerank_fixed(df, iterations=iters).collect()}
    assert all(v > 0 for v in out.values())
    scale = 10**12
    # each integer div loses < 1 unit; bound by (#nodes + #edges) per iter
    slack = (len(out) + len(edges) + 2) * iters + len(out)
    assert scale - slack <= sum(out.values()) <= scale
    out2 = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_fixed(df.repartition(7), iterations=iters).collect()
    }
    assert out == out2


@given(
    wa=st.integers(min_value=1, max_value=5),
    wb=st.integers(min_value=1, max_value=5),
    na=st.integers(min_value=10, max_value=40),
    nb=st.integers(min_value=10, max_value=40),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_mixture_schedule_prefix_proportionality(spark, wa, wb, na, nb):
    """For any weights and source sizes: priorities order deterministically,
    per-source positions are dense, and while BOTH sources remain
    unexhausted every priority-order prefix consumes them within one
    round of the weight ratio (weighted fair queueing's lag bound)."""
    from usgs_lidar_spark.operators.pipeline import mixture_schedule

    rows = [(i, "a") for i in range(na)] + [(1000 + i, "b") for i in range(nb)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_schedule(
        df, "doc_id", "source", {"a": float(wa), "b": float(wb)}
    ).collect()
    ordered = sorted(out, key=lambda r: (r["priority"], r["doc_id"]))
    for src, n in (("a", na), ("b", nb)):
        assert sorted(
            r["src_pos"] for r in ordered if r["source"] == src
        ) == list(range(n))
    seen_a = seen_b = 0
    for r in ordered:
        if r["source"] == "a":
            seen_a += 1
        else:
            seen_b += 1
        if seen_a >= na or seen_b >= nb:
            break  # one source exhausted; proportionality no longer applies
        total_w = wa + wb
        k = seen_a + seen_b
        assert abs(seen_a - k * wa / total_w) <= max(wa, wb) + 1


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # basket
            st.integers(min_value=0, max_value=12),  # item
        ),
        min_size=1,
        max_size=60,
    ),
    cap=st.integers(min_value=2, max_value=6),
)
@settings(**SET)
def test_copurchase_cap_is_sound_subset(spark, rows, cap):
    """On any input, the capped build is a SOUND truncation: every capped
    edge exists uncapped, its support never exceeds the uncapped support,
    and no basket contributes more than C(cap, 2) pairs."""
    from usgs_lidar_spark.operators.graph import copurchase_edges

    df = spark.createDataFrame(rows, ["basket", "item"])
    full = {
        (r["src"], r["dst"]): r["support"]
        for r in copurchase_edges(
            df, "basket", "item", min_support=1, keep_support=True
        ).collect()
    }
    capped = {
        (r["src"], r["dst"]): r["support"]
        for r in copurchase_edges(
            df, "basket", "item", min_support=1, max_basket=cap,
            keep_support=True,
        ).collect()
    }
    assert set(capped) <= set(full)
    assert all(capped[e] <= full[e] for e in capped)
    # per-basket contribution bound: total pair-slots <= n_baskets*C(cap,2)
    n_baskets = len({b for b, _ in rows})
    assert sum(capped.values()) <= n_baskets * cap * (cap - 1) // 2


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=80
    ),
    nb=st.sampled_from([2, 3, 17, 1024]),
)
@settings(**SET)
def test_global_rank_permutation_property(spark, vals, nb):
    """On ANY value multiset (heavy duplicates, negatives, single-value
    point masses included) and ANY bucket count, distributed global_rank
    is exactly the rank the sorted order dictates: ranks are a 1..n
    permutation and sorting by rank reproduces the (val, uid) sort."""
    from usgs_lidar_spark.operators.ranking import global_rank

    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["val", "uid"])
    got = sorted(
        (r["rank"], r["val"], r["uid"])
        for r in global_rank(df, ["val", "uid"], num_buckets=nb).collect()
    )
    want = sorted((v, i) for i, v in enumerate(vals))
    assert [rk for rk, _, _ in got] == list(range(1, len(vals) + 1))
    assert [(v, u) for _, v, u in got] == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab c".split() + ["a", "b"]),
                 min_size=0, max_size=12),
        min_size=1, max_size=10,
    ),
    phrase=st.lists(st.sampled_from(["a", "b", "c"]), min_size=2,
                    max_size=3),
)
@settings(**SET)
def test_phrase_match_equals_python_reference(spark, docs, phrase):
    """The lead-window phrase matcher equals a brute-force Python scan
    over the token lists on random corpora — match counts, first
    positions, and absence of non-matching docs."""
    from usgs_lidar_spark.operators.retrieval import phrase_match

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {}
    m = len(phrase)
    for i, toks in enumerate(docs):
        hits = [p for p in range(len(toks) - m + 1)
                if toks[p:p + m] == phrase]
        if hits:
            want[i] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(df, phrase).collect()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "x"]),
                 min_size=0, max_size=14),
        min_size=1, max_size=8,
    ),
    window=st.integers(min_value=3, max_value=6),
    nterms=st.integers(min_value=2, max_value=3),
)
@settings(**SET)
def test_proximity_match_equals_python_reference(spark, docs, window,
                                                 nterms):
    """The coverage-window proximity matcher equals a brute-force Python
    scan: a filtered posting at p is a hit iff tokens [p, p+window-1]
    cover ALL query terms. Samples 2- AND 3-term queries over a 3-letter
    alphabet with a distractor, so repeated query terms interleave
    inside minimal clusters — the case the old consecutive-m-tuple
    formulation silently missed."""
    from usgs_lidar_spark.operators.retrieval import proximity_match

    tset = ["a", "b", "c"][:nterms]
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = {}
    for i, toks in enumerate(docs):
        P = [(p, t) for p, t in enumerate(toks) if t in tset]
        hits = [
            p
            for p, _ in P
            if {t for q, t in P if p <= q <= p + window - 1} == set(tset)
        ]
        if hits:
            want[i] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in proximity_match(df, tset, window).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),   # score
            st.integers(min_value=0, max_value=9),      # weight
        ),
        min_size=0,
        max_size=30,
    ),
    budget=st.integers(min_value=0, max_value=120),
)
@settings(**SET)
def test_budget_prefix_select_matches_greedy_property(spark, rows, budget):
    """The distributed budget prefix (round 11 bucketed form) == the
    sequential greedy over (score DESC, id ASC) for arbitrary scores
    (negative, duplicated), zero weights, and budgets at/over/under the
    total — including the empty frame."""
    from usgs_lidar_spark.operators.ranking import budget_prefix_select

    data = [(i, s, w) for i, (s, w) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "doc_id long, score long, w long"
    ) if data else spark.createDataFrame([], "doc_id long, score long, w long")

    acc, want = 0, set()
    for s, i, w in sorted(
        ((s, i, w) for i, s, w in data), key=lambda x: (-x[0], x[1])
    ):
        if acc + w <= budget:
            acc += w
            want.add(i)
        else:
            break
    got = {
        r["doc_id"]
        for r in budget_prefix_select(df, "score", "w", budget).collect()
    }
    assert got == want, (budget, data)


@given(
    texts=st.lists(
        st.text(alphabet="abcX ", min_size=0, max_size=24),
        min_size=1,
        max_size=12,
    ),
    frac=st.sampled_from([0.34, 0.5, 1.0]),
)
@settings(**SET)
def test_char_shingles_fractional_equals_resolved_absolute(spark, texts, frac):
    """For ANY corpus, max_df_frac behaves exactly as the absolute cap
    it resolves to — greatest(1, ceil(frac * shingle-bearing docs)) —
    and frac=1.0 keeps everything (equals the uncapped distinct set)."""
    import math

    from usgs_lidar_spark.operators.dedup import char_shingles

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    k = 4
    un = char_shingles(df, "text", "doc_id", k=k, max_df=None).collect()
    n_docs = len({r["doc_id"] for r in un})
    resolved = max(1, math.ceil(frac * n_docs)) if n_docs else 1
    got = sorted(
        map(tuple, char_shingles(
            df, "text", "doc_id", k=k, max_df_frac=frac
        ).collect())
    )
    want = sorted(
        map(tuple, char_shingles(
            df, "text", "doc_id", k=k, max_df=resolved
        ).collect())
    )
    assert got == want
    if frac == 1.0:
        assert got == sorted(map(tuple, un))
