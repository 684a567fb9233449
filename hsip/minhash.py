"""G2 — MinHash signatures as an Iterator pandas UDF (Arrow-batched).

Permutation j approximated by universal hashing h_j(x) = (a_j*x + b_j)
mod p, p = 2^61 - 1 (Broder 1997; MMDS ch.3). Coefficients are seeded
from the config so signatures are deterministic across runs/partitions
(resume + recall-reproducibility invariants, BASELINE.json:6).

Vectorization: the Iterator form builds the (num_perm,) coefficient
vectors once per Python worker; each Arrow batch is processed as ONE
numpy broadcast over the concatenated ragged shingle arrays with a
segmented min (np.minimum.reduceat) — no per-row Python in the hot loop
(input_hint "no per-row Python", BASELINE.json:15). Row-chunking caps
the intermediate matrix at ~64 MB per worker regardless of batch shape
(SURVEY.md §4.2.4).

The multiply wraps mod 2^64 before the mod-p reduction — the standard
numpy-uint64 construction (same semantics as the public ``datasketch``
library); deterministic and empirically uniform, validated by the
statistical unbiasedness test in tests/test_minhash.py (SURVEY.md §5.4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .config import DedupConfig

_MERSENNE = np.uint64((1 << 61) - 1)
_CHUNK_CELLS = 8_000_000  # num_perm * shingle-count cells per numpy chunk


def _coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    gen = np.random.default_rng(seed)
    a = gen.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    b = gen.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
    return a, b


def _sig_batch(arrs: pd.Series, a: np.ndarray, b: np.ndarray) -> pd.Series:
    """Vectorized MinHash for one Arrow batch of shingle arrays."""
    num_perm = len(a)
    if len(arrs) == 0:
        return pd.Series([], dtype=object)
    lens = np.fromiter(
        (0 if x is None else len(x) for x in arrs), dtype=np.int64, count=len(arrs)
    )
    flat = (
        np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in arrs if x is not None and len(x)]
        )
        if lens.sum()
        else np.array([], dtype=np.int64)
    )
    flat = flat.view(np.uint64)
    out = np.empty((len(arrs), num_perm), dtype=np.uint64)
    # segment boundaries within the flat array
    starts = np.zeros(len(arrs), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # chunk rows so (num_perm x chunk_shingles) stays bounded
    max_shingles = max(1, _CHUNK_CELLS // num_perm)
    row = 0
    while row < len(arrs):
        end = row
        cells = 0
        while end < len(arrs) and (cells + lens[end] <= max_shingles or end == row):
            cells += lens[end]
            end += 1
        lo = starts[row]
        hi = lo + cells
        seg = flat[lo:hi]
        if len(seg):
            h = (a[:, None] * seg[None, :] + b[:, None]) % _MERSENNE  # (P, S)
            # clamp starts for empty segments (rows with 0 shingles), then
            # overwrite those rows with the sentinel below
            local_starts = np.minimum(
                (starts[row:end] - lo).astype(np.int64), len(seg) - 1
            )
            mins = np.minimum.reduceat(h, local_starts, axis=1)  # (P, rows)
            out[row:end] = mins.T
            empty = lens[row:end] == 0
            if empty.any():
                out[row:end][empty] = _MERSENNE
        else:
            out[row:end] = _MERSENNE
        row = end
    sig64 = out.view(np.int64)
    return pd.Series(list(sig64))


def attach_minhash(shingles_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(id, shingles) -> (id, sig: array<long> length num_perm)."""
    num_perm, seed = cfg.num_perm, cfg.seed

    @pandas_udf(T.ArrayType(T.LongType()))
    def minhash_sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        a, b = _coeffs(num_perm, seed)
        for arrs in it:
            yield _sig_batch(arrs, a, b)

    return shingles_df.select("id", minhash_sig(F.col("shingles")).alias("sig"))


def minhash_signatures_local(shingle_sets: list[list[int]], cfg: DedupConfig) -> np.ndarray:
    """Driver-local golden implementation for tests (same math, no Spark)."""
    a, b = _coeffs(cfg.num_perm, cfg.seed)
    out = np.empty((len(shingle_sets), cfg.num_perm), dtype=np.uint64)
    for i, s in enumerate(shingle_sets):
        x = np.asarray(s, dtype=np.int64).view(np.uint64)
        out[i] = ((a[:, None] * x[None, :] + b[:, None]) % _MERSENNE).min(axis=1)
    return out.view(np.int64)
