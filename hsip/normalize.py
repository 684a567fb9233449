"""R3 — text normalization. Pure-SQL (codegen'd, JVM-side).

The original ``text`` column is never mutated: the per-turn/byte-exact
text-equality invariant (/root/repo/BASELINE.json:15) requires the raw
text to survive the pipeline untouched. Normalization produces a new
column used only for shingling/fingerprinting — same stage split as the
reference's normalize step (SURVEY.md §0.1 stage 1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .config import DedupConfig


def norm_text_col(col: str | Column, cfg: DedupConfig) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if cfg.lowercase:
        c = F.lower(c)
    if cfg.strip_punct:
        c = F.regexp_replace(c, r"[^\w\s]", " ")
    if cfg.collapse_ws:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def tokens_col(norm_col: Column) -> Column:
    """Whitespace tokens of an already-normalized string; empty text -> []."""
    return F.filter(F.split(norm_col, " "), lambda t: t != F.lit(""))
