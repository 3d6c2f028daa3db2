"""Distributed statistical resampling: the deterministic Poisson
bootstrap.

Classical bootstrap resampling (draw n rows with replacement, B times)
is impossible at 100 TB — it needs n global draws per replicate. The
Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
Massive Data Streams", the standard production substitute) replaces
per-replicate multinomial draws with an INDEPENDENT Poisson(1)
multiplicity per (row, replicate): map-only, one pass, embarrassingly
parallel, and the replicate statistics converge to the classical
bootstrap distribution.

This implementation makes the multiplicities DETERMINISTIC: the
uniform driving each (row, replicate) cell is the engine's two-round
Lehmer hash of (id, replicate), and the Poisson(1) inverse CDF is
applied through fixed integer thresholds (scaled by the hash modulus),
so every engine and every partitioning draws the SAME resamples — the
bootstrap is replayable in ANSI SQL and safe for hash-compared
oracles, where rand()-based resampling is not reproducible even
run-to-run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from usgs_lidar_spark.operators.pipeline import _LEHMER_M, portable_hash_long

#: Second reduction prime for the 64-bit id fold (largest prime below
#: _LEHMER_M). A single ``id mod M`` reduction collapses ids that differ
#: by a multiple of 2^31-1 onto IDENTICAL multiplicity streams —
#: perfectly correlated resamples past the 2^31-row id space the
#: docstrings target. Combining residues mod two distinct primes keeps
#: ids distinct up to lcm(M, M2) ~ 2^62, covering the whole practical
#: 64-bit id range, with no shifts or division (portable + sign-safe in
#: any engine with 64-bit integers and a pmod idiom).
_LEHMER_M2 = 2147483629

#: Poisson(1) inverse-CDF thresholds, scaled to the Lehmer modulus
#: (2^31-1): P(X <= k) for k = 0..4; a uniform hash in [0, M) maps to
#: multiplicity = #thresholds it clears. Truncated at 5 (P(X >= 6) ~
#: 6e-4 — the same truncation production implementations use; the
#: exact cutoffs are pinned constants so both engines agree forever).
_POIS1_CDF = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
              0.9810118431238462, 0.9963401531726563)
POISSON1_THRESHOLDS = tuple(int(p * _LEHMER_M) for p in _POIS1_CDF)


def poisson_multiplicity(id_col: Column | str, replicate: Column, seed: int = 0) -> Column:
    """Deterministic Poisson(1) multiplicity for (id, replicate):
    u = lehmer(fold64(id) * 131 + replicate + seed) compared against the
    fixed integer thresholds, where fold64 combines the id's residues
    mod two distinct 31-bit primes — so ids differing by a multiple of
    2^31-1 draw INDEPENDENT multiplicity streams (they only collide past
    ~2^62, the lcm of the two primes). Returns 0..5 as an int column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # Fold the full 64-bit id into [0, M) BEFORE the mix multiply: the
    # two pmods keep every intermediate under 2^47 (no ANSI overflow),
    # and the second-prime residue carries the high bits a single
    # ``id mod M`` reduction would discard.
    v = c.cast("long")
    folded = F.pmod(
        F.pmod(v, F.lit(_LEHMER_M))
        + F.lit(48271) * F.pmod(v, F.lit(_LEHMER_M2)),
        F.lit(_LEHMER_M),
    )
    u = portable_hash_long(folded * F.lit(131) + replicate, seed=seed)
    m = F.lit(0)
    for t in POISSON1_THRESHOLDS:
        m = m + F.when(u >= F.lit(t), 1).otherwise(0)
    return m


def _value_as_long(value_col: str, fn: str) -> Column:
    """``value_col`` as BIGINT with the module's loud-failure convention
    made STRUCTURAL: a NULL value raises in the same pass (a per-row
    ``raise_error`` branch inside the select — no extra validation scan
    at 100 TB). Silently keeping the row would count its multiplicity in
    n_eff while ``m * NULL`` drops out of value_sum, deflating every
    replicate mean — the same bias class `budget_prefix_select` rejects
    loudly."""
    v = F.col(value_col)
    return F.when(v.isNotNull(), v.cast("long")).otherwise(
        F.raise_error(
            F.lit(
                f"{fn}: NULL in value column {value_col!r} — a NULL row "
                "would inflate n_eff while dropping out of value_sum, "
                "biasing every replicate mean; filter or impute first"
            )
        )
    )


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 32,
    seed: int = 0,
) -> DataFrame:
    """B deterministic Poisson-bootstrap replicates of SUM and COUNT of
    ``value_col`` — the bounded frame a CI computation reads (replicate
    means are value_sum/n_eff; percentile bounds over B rows are a
    driver-trivial follow-up).

    Scale shape: one map-only pass — each row explodes into its B
    (replicate, multiplicity) cells (generated as a literal-sequence
    transform inside codegen, multiplicity-0 cells dropped before the
    shuffle), then ONE map-side-combined aggregate keyed by replicate:
    B partial rows per partition on the wire, never data. Values are
    summed as-is; callers wanting exactness pass integer-valued
    columns (the oracled query sums BIGINT n_chars).

    Returns (replicate, n_eff, value_sum), ``n_replicates`` rows
    (replicates with an empty resample still appear, with 0s). Rows
    with a NULL value raise loudly (per-row, in the same pass — see
    `_value_as_long`).
    """
    if n_replicates <= 0:
        raise ValueError(
            f"n_replicates must be positive, got {n_replicates}"
        )
    reps = F.sequence(F.lit(0), F.lit(n_replicates - 1))
    # Integer contract made structural: the value enters as BIGINT per
    # ROW (a float column would otherwise sum in doubles and silently
    # truncate once at the end — per-row casting is the visible,
    # order-independent semantics). NULL values raise in the same pass.
    cells = df.select(
        _value_as_long(value_col, "poisson_bootstrap").alias("__v"),
        F.explode(
            F.filter(
                F.transform(
                    reps,
                    lambda b: F.struct(
                        b.cast("long").alias("replicate"),
                        poisson_multiplicity(
                            F.col(id_col), b, seed=seed
                        ).cast("long").alias("m"),
                    ),
                ),
                # `| isNull()`: without it a NULL-value row whose
                # multiplicity is 0 in EVERY replicate generates zero
                # cells, and Catalyst never evaluates the raise branch
                # for rows the generator pruned (ADVICE r9) — the NULL
                # would pass silently (unbiased, since m=0 rows
                # contribute nothing, but the loud-NULL contract must
                # not depend on the draw). Keeping NULL rows' cells
                # unconditionally guarantees _value_as_long fires.
                lambda s: (s["m"] > 0) | F.col(value_col).isNull(),
            )
        ).alias("c"),
    )
    got = cells.groupBy(F.col("c.replicate").alias("replicate")).agg(
        F.sum("c.m").cast("long").alias("n_eff"),
        F.sum(F.col("c.m") * F.col("__v")).alias("value_sum"),
    )
    spark = df.sparkSession
    base = spark.range(n_replicates).select(
        F.col("id").cast("long").alias("replicate")
    )
    return base.join(got, "replicate", "left").select(
        "replicate",
        F.coalesce("n_eff", F.lit(0)).cast("long").alias("n_eff"),
        F.coalesce("value_sum", F.lit(0)).cast("long").alias("value_sum"),
    )


def poisson_bootstrap_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    n_replicates: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Per-GROUP Poisson-bootstrap replicates — the practical form of
    the CI operator ("mean quality per source, with uncertainty"):
    the same deterministic per-(row, replicate) multiplicities as
    `poisson_bootstrap` (group membership does not perturb the draw —
    a row resamples identically whether or not you slice by source),
    aggregated per (group, replicate).

    Same map-only shape; the shuffle carries |groups| x B partial rows
    per partition. NULL groups pass through as their own group (they
    are data, and silently dropping them would bias every CI that
    should have included them). Returns (group, replicate, n_eff,
    value_sum) for every observed group x replicate, zero-filled.
    """
    if n_replicates <= 0:
        raise ValueError(
            f"n_replicates must be positive, got {n_replicates}"
        )
    reps = F.sequence(F.lit(0), F.lit(n_replicates - 1))
    cells = df.select(
        F.col(group_col).alias("group"),
        _value_as_long(value_col, "poisson_bootstrap_grouped").alias("__v"),
        F.explode(
            F.filter(
                F.transform(
                    reps,
                    lambda b: F.struct(
                        b.cast("long").alias("replicate"),
                        poisson_multiplicity(
                            F.col(id_col), b, seed=seed
                        ).cast("long").alias("m"),
                    ),
                ),
                # same NULL-row keep as poisson_bootstrap: the loud
                # raise must fire even when every multiplicity is 0.
                lambda s: (s["m"] > 0) | F.col(value_col).isNull(),
            )
        ).alias("c"),
    )
    got = cells.groupBy(
        "group", F.col("c.replicate").alias("replicate")
    ).agg(
        F.sum("c.m").cast("long").alias("n_eff"),
        F.sum(F.col("c.m") * F.col("__v")).cast("long").alias("value_sum"),
    )
    spark = df.sparkSession
    base = (
        df.select(F.col(group_col).alias("group"))
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(n_replicates).select(
                    F.col("id").cast("long").alias("replicate")
                )
            )
        )
    )
    # eqNullSafe on the group key: a plain equi-join drops the NULL
    # group's aggregated stats at the zero-fill step (NULL never equals
    # NULL), silently zeroing exactly the rows the docstring promises
    # to keep.
    g2 = (
        got.withColumnRenamed("group", "__g")
        .withColumnRenamed("replicate", "__r")
    )
    return (
        base.join(
            g2,
            base["group"].eqNullSafe(g2["__g"])
            & (base["replicate"] == g2["__r"]),
            "left",
        )
        .select(
            "group",
            "replicate",
            F.coalesce("n_eff", F.lit(0)).cast("long").alias("n_eff"),
            F.coalesce("value_sum", F.lit(0)).cast("long").alias("value_sum"),
        )
    )
