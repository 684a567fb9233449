"""PII redaction — regex masking of contact identifiers, pure JVM.

Training corpora (and the health-services record-linkage domain this
engine models) must strip direct identifiers before anything else
touches the text. This stage is a chain of ``regexp_replace`` +
``regexp_count`` expressions — whole-stage codegen, zero shuffle, zero
Python — so it runs at scan speed and composes in front of any dedup
pipeline (redact -> normalize -> dedup keeps masked duplicates
clusterable: two records differing only in their PII redact to
identical text and fall into the exact-dup channel).

Pattern dialect is deliberately the portable intersection of Java
regex (Spark) and RE2 (DuckDB/Go): character classes, bounded repeats,
``\\b`` word boundaries — no backreferences, no lookaround — so the
same pattern strings drive both the engine and the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Ordered dict: replacement runs in this order, and order matters —
# emails are masked before phone/id patterns so digit runs inside a
# local-part aren't double-masked.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "idnum": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str = "text_redacted",
    patterns: dict[str, str] | None = None,
    count_cols: bool = True,
) -> DataFrame:
    """Mask every PII pattern occurrence with ``[KIND]``.

    Adds ``out_col`` (the masked text; the raw column is never mutated —
    same contract as normalization) and, when ``count_cols``, one
    ``n_<kind>`` long column per pattern counting matches in the RAW
    text (counts are audit evidence: a redaction job must report how
    much it removed, not silently rewrite).
    """
    pats = PII_PATTERNS if patterns is None else patterns
    masked = F.col(text_col)
    for kind, pat in pats.items():
        masked = F.regexp_replace(masked, F.lit(pat), F.lit(f"[{kind.upper()}]"))
    out = df.withColumn(out_col, masked)
    if count_cols:
        for kind, pat in pats.items():
            out = out.withColumn(
                f"n_{kind}",
                F.regexp_count(F.col(text_col), F.lit(pat)).cast("long"),
            )
    return out


def redaction_oracle_sql(text_expr: str,
                         patterns: dict[str, str] | None = None) -> str:
    """DuckDB expression list equivalent to redact_pii over ``text_expr``:
    the SAME pattern strings, chained regexp_replace with the 'g' flag
    plus len(regexp_extract_all(...)) counts. Returned as
    ``masked_expr AS text_redacted, ... AS n_<kind>, ...`` for embedding
    in a SELECT — keeps the contract oracle and the engine pinned to one
    pattern table.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    masked = text_expr
    for kind, pat in pats.items():
        masked = f"regexp_replace({masked}, '{pat}', '[{kind.upper()}]', 'g')"
    cols = [f"{masked} AS text_redacted"]
    for kind, pat in pats.items():
        cols.append(
            f"CAST(len(regexp_extract_all({text_expr}, '{pat}')) AS BIGINT)"
            f" AS n_{kind}"
        )
    return ", ".join(cols)
