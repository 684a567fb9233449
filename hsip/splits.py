"""Deterministic dataset splitting — content-addressed, engine-portable.

Train/val/test assignment at 100-TB scale must NOT be RNG sampling: a
rerun, a repartition, or an incremental append would reshuffle rows
across splits (leaking eval data into training). Instead each key is
hashed to a stable bucket — ``md5(key || ':' || salt)`` hex prefix as
an integer mod 100 — so a row keeps its split forever, new rows land
i.i.d., and the same expression evaluates identically in Spark (Java
md5 + conv) and any SQL engine with md5 (the DuckDB oracle). Pure
projection: zero shuffle, whole-stage codegen, scan-speed.

md5 here is a partitioner, not security — its output is uniform enough
that split sizes concentrate at the requested fractions (binomial CI).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SPLITS: dict[str, int] = {"train": 90, "val": 5, "test": 5}


def split_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, 100): integer value of the first 8 md5 hex
    chars of ``key || ':' || salt``, mod 100. ``salt`` gives independent
    re-draws (e.g. per experiment) without touching the key."""
    h = F.md5(F.concat(key.cast("string"), F.lit(":" + salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 100)


def assign_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int] | None = None,
    salt: str = "",
    bucket_col: str = "bucket",
    split_col: str = "split",
) -> DataFrame:
    """Add ``bucket`` (0-99) and ``split`` columns. ``splits`` maps split
    name -> percent; must sum to 100. Assignment is by cumulative bucket
    ranges in dict order, so {"train": 90, "val": 5, "test": 5} puts
    buckets [0,90) in train, [90,95) in val, [95,100) in test.
    """
    pct = DEFAULT_SPLITS if splits is None else splits
    if sum(pct.values()) != 100:
        raise ValueError(f"split percents must sum to 100, got {pct}")
    b = split_bucket(F.col(key_col), salt)
    expr = None
    hi = 0
    for name, p in pct.items():
        hi += p
        expr = F.when(b < hi, F.lit(name)) if expr is None \
            else expr.when(b < hi, F.lit(name))
    return df.withColumn(bucket_col, b).withColumn(split_col, expr)


def split_oracle_sql(key_expr: str, splits: dict[str, int] | None = None,
                     salt: str = "") -> tuple[str, str]:
    """(bucket_expr, split_case_expr) in DuckDB SQL, same semantics as
    ``assign_split`` — one definition drives engine and oracle."""
    pct = DEFAULT_SPLITS if splits is None else splits
    bucket = (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'),"
        f" 1, 8))::UBIGINT % 100 AS BIGINT)"
    )
    case = "CASE"
    hi = 0
    for name, p in pct.items():
        hi += p
        case += f" WHEN {bucket} < {hi} THEN '{name}'"
    case += " END"
    return bucket, case


# --- Deterministic stratified sampling -------------------------------------
#
# Per-stratum downsampling (e.g. "keep 50% of en, 10% of everything else")
# must share the split machinery's guarantees: no RNG, stable under rerun /
# repartition / incremental append, identical expression in any md5-capable
# engine. A finer resolution than the 100 split buckets lets fractions like
# 0.123 be exact; a different salt separator ('#' vs ':') plus a different
# md5 prefix width (12 hex chars vs 8) decorrelates sampling from split
# assignment even when both use the same salt string.

SAMPLE_RESOLUTION = 1_000_000


def sample_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, SAMPLE_RESOLUTION): first 12 md5 hex chars
    (48 bits — exact in a signed long) of ``key || '#' || salt``."""
    h = F.md5(F.concat(key.cast("string"), F.lit("#" + salt)))
    return (
        F.conv(F.substring(h, 1, 12), 16, 10).cast("long")
        % SAMPLE_RESOLUTION
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically:
    row survives iff ``sample_bucket(key) < fraction * RESOLUTION``. Pure
    projection + filter — zero shuffle, whole-stage codegen, and a row's
    fate never changes across reruns or appends (no eval-set churn).
    Strata absent from ``fractions`` fall back to ``default``."""
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} out of [0,1]: {f}")
    b = sample_bucket(F.col(key_col), salt)
    thr = None
    for s, f in fractions.items():
        t = int(round(f * SAMPLE_RESOLUTION))
        cond = F.col(stratum_col) == s
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        F.lit(int(round(default * SAMPLE_RESOLUTION)))
        if thr is None
        else thr.otherwise(int(round(default * SAMPLE_RESOLUTION)))
    )
    return df.filter(b < thr)


def stratified_oracle_predicate(
    key_expr: str,
    stratum_expr: str,
    fractions: dict[str, float],
    salt: str = "",
    default: float = 0.0,
) -> str:
    """DuckDB WHERE predicate with semantics identical to
    ``stratified_sample`` — one definition drives engine and oracle."""
    bucket = (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '#{salt}'),"
        f" 1, 12))::UBIGINT % {SAMPLE_RESOLUTION} AS BIGINT)"
    )
    case = "CASE"
    for s, f in fractions.items():
        t = int(round(f * SAMPLE_RESOLUTION))
        case += f" WHEN {stratum_expr} = '{s}' THEN {t}"
    case += f" ELSE {int(round(default * SAMPLE_RESOLUTION))} END"
    return f"{bucket} < {case}"
