"""S7 — deterministic synthetic transcript corpus with planted duplicates.

Re-expresses the reference's blocking/matching test cases (BASELINE.json:6)
as a seeded generator: every byte derives from ``seed`` via numpy's
Philox-based default_rng, so two runs (or two machines) produce identical
corpora — required for resume/recall reproducibility and for the bench
protocol's fixed input (BASELINE.md). Shape is the authoritative input
schema (conv_id, turn_idx, role, text, tool, ts) from BASELINE.json:15.

Planted ground truth (FIXTURES.md §1): exact copies, token-edited near
copies (MinHash/LSH channel), few-character edits (SimHash channel),
embedded long spans (substring channel), a hot boilerplate band
(skew/salting fixture), plus edge cases: shuffled arrival order,
duplicated (conv_id, turn_idx) versions, empty turns, 1-turn and very
long conversations. Sidecar truth table: (conv_id, gt_cluster, dup_kind).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import schemas

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "python", "browser", "calculator", ""]


def _vocab(rng: np.random.Generator, size: int = 1000) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    words = []
    lens = rng.integers(3, 10, size=size)
    for ln in lens:
        words.append("".join(letters[rng.integers(0, 26, size=int(ln))]))
    return np.array(words, dtype=object)


@dataclass
class GenResult:
    transcripts: pd.DataFrame
    truth: pd.DataFrame


def _make_turns(rng: np.random.Generator, vocab: np.ndarray, n_turns: int,
                min_tok: int = 20, max_tok: int = 200) -> list[str]:
    out = []
    for _ in range(n_turns):
        n = int(rng.integers(min_tok, max_tok + 1))
        out.append(" ".join(vocab[rng.integers(0, len(vocab), size=n)]))
    return out


def _near_edit(rng: np.random.Generator, vocab: np.ndarray, turns: list[str],
               frac_lo: float = 0.01, frac_hi: float = 0.15) -> list[str]:
    """Substitute/delete 1-15% of tokens per turn -> Jaccard ~0.7-0.97."""
    out = []
    frac = float(rng.uniform(frac_lo, frac_hi))
    for t in turns:
        toks = t.split(" ")
        n_edit = max(1, int(len(toks) * frac))
        idx = rng.choice(len(toks), size=min(n_edit, len(toks)), replace=False)
        for i in idx:
            if rng.random() < 0.7:
                toks[i] = str(vocab[int(rng.integers(0, len(vocab)))])
            else:
                toks[i] = ""
        out.append(" ".join(tok for tok in toks if tok))
    return out


def _char_edit(rng: np.random.Generator, turns: list[str], n_edits: int = 3) -> list[str]:
    """<= n_edits single-character substitutions across the conversation."""
    out = list(turns)
    for _ in range(int(rng.integers(1, n_edits + 1))):
        ti = int(rng.integers(0, len(out)))
        s = out[ti]
        if len(s) < 2:
            continue
        pos = int(rng.integers(0, len(s)))
        ch = chr(ord("a") + int(rng.integers(0, 26)))
        out[ti] = s[:pos] + ch + s[pos + 1 :]
    return out


def gen_transcripts(seed: int = 42, n_base: int = 1000) -> GenResult:
    """Generate the planted-duplicate corpus. ~n_base*1.25 conversations,
    ~22 turns each. All determinism flows from ``seed``."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(rng)
    t0 = datetime(2025, 1, 1)

    convs: list[tuple[str, list[str], str, str]] = []  # (conv_id, turns, gt, kind)
    base_turns: list[list[str]] = []
    for i in range(n_base):
        cid = f"c{i:07d}"
        n_turns = int(rng.integers(4, 41))
        turns = _make_turns(rng, vocab, n_turns)
        base_turns.append(turns)
        convs.append((cid, turns, cid, "base"))

    n_exact = n_base * 5 // 100
    n_near = n_base * 10 // 100
    n_nearid = n_base * 5 // 100
    n_substr = n_base * 5 // 100
    nxt = n_base

    def base_pick() -> int:
        return int(rng.integers(0, n_base))

    for _ in range(n_exact):
        j = base_pick()
        convs.append((f"c{nxt:07d}", list(base_turns[j]), f"c{j:07d}", "exact"))
        nxt += 1
    for _ in range(n_near):
        j = base_pick()
        convs.append(
            (f"c{nxt:07d}", _near_edit(rng, vocab, base_turns[j]), f"c{j:07d}", "near")
        )
        nxt += 1
    for _ in range(n_nearid):
        j = base_pick()
        convs.append(
            (f"c{nxt:07d}", _char_edit(rng, base_turns[j]), f"c{j:07d}", "nearid")
        )
        nxt += 1
    for _ in range(n_substr):
        # unrelated conversation embedding a >=200-char contiguous span
        j = base_pick()
        span_src = "\n".join(base_turns[j])
        start = int(rng.integers(0, max(1, len(span_src) - 400)))
        span = span_src[start : start + 400]
        fresh = _make_turns(rng, vocab, int(rng.integers(4, 12)))
        ti = int(rng.integers(0, len(fresh)))
        fresh[ti] = fresh[ti][: len(fresh[ti]) // 2] + " " + span + " " + fresh[ti][len(fresh[ti]) // 2 :]
        convs.append((f"c{nxt:07d}", fresh, f"c{j:07d}", "substr"))
        nxt += 1

    # megacluster: many exact copies of one base -> a genuinely-hot LSH
    # bucket (bucket_cap star-pairing must preserve recall through CC)
    n_mega = max(10, n_base // 10)
    for _ in range(n_mega):
        convs.append((f"c{nxt:07d}", list(base_turns[0]), "c0000000", "exact"))
        nxt += 1

    # hot band: ~200 conversations sharing one boilerplate opening turn.
    # ~150 chars (< min_substr_len=200) so they are NOT substring
    # duplicates — they stress blocking precision, not recall.
    boiler = " ".join(vocab[rng.integers(0, len(vocab), size=22)])[:150]
    n_hot = min(200, max(20, n_base // 5))
    for _ in range(n_hot):
        turns = [boiler] + _make_turns(rng, vocab, int(rng.integers(3, 10)))
        convs.append((f"c{nxt:07d}", turns, f"c{nxt:07d}", "hotband"))
        nxt += 1

    # edge cases
    convs.append((f"c{nxt:07d}", [""], f"c{nxt:07d}", "empty")); nxt += 1
    convs.append((f"c{nxt:07d}", ["single turn short"], f"c{nxt:07d}", "oneturn")); nxt += 1
    convs.append((f"c{nxt:07d}", _make_turns(rng, vocab, 400), f"c{nxt:07d}", "long")); nxt += 1

    rows: list[tuple] = []
    truth_rows: list[tuple] = []
    for cid, turns, gt, kind in convs:
        truth_rows.append((cid, gt, kind))
        start = t0 + timedelta(seconds=int(rng.integers(0, 30_000_000)))
        for ti, text in enumerate(turns):
            role = _ROLES[ti % 3]
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else ""
            ts = start + timedelta(seconds=ti * int(rng.integers(1, 120)))
            rows.append((cid, ti, role, text, tool, ts))

    # duplicated (conv_id, turn_idx) versions: older ts carries stale text
    n_dupver = max(5, len(convs) // 100)
    for _ in range(n_dupver):
        i = int(rng.integers(0, len(rows)))
        cid, ti, role, text, tool, ts = rows[i]
        rows.append((cid, ti, role, text + " STALE_VERSION", tool, ts - timedelta(hours=1)))

    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # shuffled arrival order (stable given seed)
    df = df.iloc[rng.permutation(len(df))].reset_index(drop=True)
    truth = pd.DataFrame(truth_rows, columns=["conv_id", "gt_cluster", "dup_kind"])
    return GenResult(transcripts=df, truth=truth)


def to_spark(spark: SparkSession, gen: GenResult) -> tuple[DataFrame, DataFrame]:
    t = spark.createDataFrame(gen.transcripts, schema=schemas.TRANSCRIPTS)
    truth = spark.createDataFrame(gen.truth, schema=schemas.TRANSCRIPTS_TRUTH)
    return t, truth


def truth_pairs(truth: DataFrame) -> DataFrame:
    """Ground-truth duplicate pairs (a<b) from the sidecar cluster labels.
    hotband conversations are NOT duplicates (shared boilerplate only)."""
    from pyspark.sql import functions as F

    d = truth.filter(~F.col("dup_kind").isin("hotband")).select("conv_id", "gt_cluster")
    x, y = d.alias("x"), d.alias("y")
    return (
        x.join(
            y,
            (F.col("x.gt_cluster") == F.col("y.gt_cluster"))
            & (F.col("x.conv_id") < F.col("y.conv_id")),
        )
        .select(F.col("x.conv_id").alias("a"), F.col("y.conv_id").alias("b"))
        .distinct()
    )
