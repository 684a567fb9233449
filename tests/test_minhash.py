"""G2 property tests (SURVEY.md §5.4): MinHash unbiasedness, determinism,
Spark/local golden equality."""

import numpy as np
import pytest
from pyspark.sql import types as T

from hsip import schemas
from hsip.config import DedupConfig
from hsip.minhash import attach_minhash, minhash_signatures_local


def _sets_with_jaccard(rng, jaccard, size=400):
    n_shared = int(size * 2 * jaccard / (1 + jaccard))
    shared = rng.integers(-(2**62), 2**62, size=n_shared).tolist()
    only_a = rng.integers(-(2**62), 2**62, size=size - n_shared).tolist()
    only_b = rng.integers(-(2**62), 2**62, size=size - n_shared).tolist()
    return shared + only_a, shared + only_b


@pytest.mark.parametrize("jacc", [0.3, 0.6, 0.9])
@pytest.mark.parametrize("variant", ["classic", "oph"])
def test_unbiasedness(jacc, variant):
    """Mean signature agreement ~= Jaccard (Broder'97 for classic;
    Li'12/Shrivastava'14 for OPH+densification), CLT tolerance."""
    cfg = DedupConfig(num_perm=256, minhash_variant=variant)
    rng = np.random.default_rng(7)
    agreements = []
    for _ in range(8):
        a, b = _sets_with_jaccard(rng, jacc)
        true_j = len(set(a) & set(b)) / len(set(a) | set(b))
        sa, sb = minhash_signatures_local([a, b], cfg)
        agreements.append((np.array(sa) == np.array(sb)).mean() - true_j)
    bias = float(np.mean(agreements))
    assert abs(bias) < 3 * 0.5 / np.sqrt(256 * 8)  # 3 sigma


def test_spark_matches_local(spark):
    cfg = DedupConfig(num_perm=64, lsh_bands=64, lsh_rows=1)
    rng = np.random.default_rng(3)
    sets = [rng.integers(-(2**62), 2**62, size=50).tolist() for _ in range(20)]
    df = spark.createDataFrame(
        [(str(i), s) for i, s in enumerate(sets)], schema=schemas.SHINGLES
    )
    got = {r.id: list(r.sig) for r in attach_minhash(df, cfg).collect()}
    want = minhash_signatures_local(sets, cfg)
    for i in range(20):
        assert got[str(i)] == list(want[i])


def test_partitioning_invariance(spark):
    """Signatures identical under repartition(1) vs repartition(7)."""
    cfg = DedupConfig(num_perm=32, lsh_bands=32, lsh_rows=1)
    rng = np.random.default_rng(5)
    sets = [rng.integers(-(2**62), 2**62, size=30).tolist() for _ in range(50)]
    df = spark.createDataFrame(
        [(str(i), s) for i, s in enumerate(sets)], schema=schemas.SHINGLES
    )
    a = {r.id: tuple(r.sig) for r in attach_minhash(df.repartition(1), cfg).collect()}
    b = {r.id: tuple(r.sig) for r in attach_minhash(df.repartition(7), cfg).collect()}
    assert a == b


def test_identical_sets_identical_sigs():
    cfg = DedupConfig(num_perm=128)
    s = list(range(100, 400))
    sa, sb = minhash_signatures_local([s, list(s)], cfg)
    assert list(sa) == list(sb)


def test_classic_signature_neighbor_invariant_around_empty_rows():
    """A doc's classic-variant signature must not depend on its batch
    neighbors: empty/None shingle rows adjacent to a real doc previously
    TRUNCATED that doc's reduceat segment (the clamped start excluded
    its last shingles from the min), silently corrupting signatures and
    therefore LSH banding."""
    import numpy as np
    import pandas as pd

    from hsip.minhash import _EMPTY_SENTINEL, _coeffs, _sig_batch

    a, b = _coeffs(16, 42)
    x = np.array([111, 222], dtype=np.int64)
    y = np.array([333, 444, 555], dtype=np.int64)
    e = np.array([], dtype=np.int64)
    alone_x = _sig_batch(pd.Series([x]), a, b)[0]
    alone_y = _sig_batch(pd.Series([y]), a, b)[0]
    for batch, idx, idy in [
        ([x, e], 0, None), ([e, x], 1, None),
        ([e, x, e, y, e], 1, 3), ([x, None, y], 0, 2),
    ]:
        got = _sig_batch(pd.Series(batch, dtype=object), a, b)
        assert (got[idx] == alone_x).all(), f"x corrupted in {batch}"
        if idy is not None:
            assert (got[idy] == alone_y).all(), f"y corrupted in {batch}"
        for i, arr in enumerate(batch):
            if arr is None or len(arr) == 0:
                sent = np.asarray(got[i], dtype=np.int64).view(np.uint64)
                assert (sent == _EMPTY_SENTINEL).all()


def test_oph_densification_is_nearest_nonempty_right():
    """r6 kernel rewrite pin: the one-pass suffix-scan densification must
    equal the rotation-fixpoint definition — every EMPTY bin borrows the
    value of the nearest NON-EMPTY bin to its right, circularly
    (Shrivastava & Li, ICML 2014). Checked against a brute-force oracle
    over adversarial shapes: single-shingle docs (127 empty bins), empty
    docs (all-sentinel rows must survive), and dense docs (no-op)."""
    import numpy as np
    import pandas as pd

    from hsip.minhash import _EMPTY_SENTINEL, _coeffs, _oph_batch

    rng = np.random.default_rng(11)
    num_perm = 128
    a, b = _coeffs(num_perm, 5)
    arrs = [
        None,
        np.array([], dtype=np.int64),
        rng.integers(-2**62, 2**62, 1).astype(np.int64),   # 1 filled bin
        rng.integers(-2**62, 2**62, 2).astype(np.int64),
        rng.integers(-2**62, 2**62, 5000).astype(np.int64),  # dense
    ]
    sigs = np.vstack(list(_oph_batch(pd.Series(arrs, dtype=object),
                                     num_perm, a[0], b[0])))

    # brute-force oracle: scatter-min then per-bin circular right search
    for i, x in enumerate(arrs):
        raw = np.full(num_perm, _EMPTY_SENTINEL, dtype=np.uint64)
        if x is not None and len(x):
            v = a[0] * x.view(np.uint64) + b[0]
            bins = (v >> np.uint64(64 - 7)).astype(np.int64)
            for bn, val in zip(bins, v):
                raw[bn] = min(raw[bn], val)
        expect = raw.copy()
        if (raw != _EMPTY_SENTINEL).any():
            for j in range(num_perm):
                if raw[j] == _EMPTY_SENTINEL:
                    d = 1
                    while raw[(j + d) % num_perm] == _EMPTY_SENTINEL:
                        d += 1
                    expect[j] = raw[(j + d) % num_perm]
        assert np.array_equal(sigs[i].view(np.uint64), expect), f"row {i}"
