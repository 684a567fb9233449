"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All pure-SQL (JVM, whole-stage codegen) except language ID's character
n-gram profile, which is a numpy pandas UDF. These run over the
``documents`` fixture and over reassembled conversations.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# tiny built-in stopword profiles: the highest-frequency function words per
# language (public knowledge; enough for a coarse heuristic router)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "que"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "una", "es"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"},
}

# BPE-ish token pattern: word pieces OR single non-space punctuation
TOKEN_PATTERN = r"[a-zA-Z0-9_]+|[^\sa-zA-Z0-9_]"


def token_count_col(text: Column) -> Column:
    """Whitespace-split token count (fast path)."""
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != F.lit("")))


def bpe_ish_token_count_col(text: Column) -> Column:
    """Regex token count approximating a BPE pre-tokenizer's piece count."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0))


def quality_columns(text: Column) -> dict[str, Column]:
    """Cheap quality signals: length, punctuation/digit/whitespace ratios,
    lexical diversity — the standard web-corpus filters."""
    n_chars = F.length(text)
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
    toks_raw = F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))
    n_tokens = F.size(toks)
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        # \p{L}\p{N} (not bare \w, ASCII-only in Java AND RE2): without
        # it every non-Latin letter counts as punctuation and clean
        # Russian/Greek/CJK prose scores punct_ratio ~ 1.0 — the exact
        # trap normalize.py's (?U) note documents, written with \p
        # classes here so DuckDB's RE2 (no (?U) support) can replicate
        # the expression verbatim
        "punct_ratio": F.round(
            (n_chars
             - F.length(F.regexp_replace(text, r"[^\p{L}\p{N}_\s]", ""))) /
            F.greatest(n_chars, F.lit(1)),
            6,
        ),
        "digit_ratio": F.round(
            (n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))) /
            F.greatest(n_chars, F.lit(1)),
            6,
        ),
        "diversity": F.round(
            F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1)), 6
        ),
        # true mean token length (sum of token chars / tokens), NOT the
        # (n_chars - n_tokens + 1)/n_tokens shortcut, which assumes
        # single-space-separated text: on raw indented/markdown docs the
        # whitespace runs inflate it several-fold
        "mean_token_len": F.round(
            F.length(F.array_join(toks_raw, "")) /
            F.greatest(n_tokens, F.lit(1)), 6
        ),
    }


def attach_quality(df: DataFrame, text_col: str) -> DataFrame:
    cols = quality_columns(F.col(text_col))
    return df.select("*", *[c.alias(k) for k, c in cols.items()])


def lang_id_stopwords(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-vote language ID (pure SQL): argmax over per-language
    stopword hit counts; 'und' (undetermined) when nothing matches."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit(""))
    scores = [
        F.size(F.array_intersect(F.array_distinct(toks),
                                 F.array(*[F.lit(w) for w in sorted(ws)]))).alias(lang)
        for lang, ws in _STOPWORDS.items()
    ]
    scored = df.select(F.col(id_col).cast("string").alias("id"), *scores)
    langs = list(_STOPWORDS)
    best = F.greatest(*[F.col(lang) for lang in langs])
    pick = F.coalesce(
        *[F.when((F.col(lang) == best) & (best > 0), F.lit(lang)) for lang in langs],
        F.lit("und"),
    )
    return scored.select("id", pick.alias("lang_pred"), best.alias("lang_score"))


def char_ngram_profile(df: DataFrame, id_col: str, text_col: str, n: int = 3,
                       num_buckets: int = 64) -> DataFrame:
    """Hashed character-n-gram frequency profile (numpy pandas UDF) — the
    feature vector a real langid/quality classifier consumes downstream."""

    @pandas_udf(T.ArrayType(T.DoubleType()))
    def profile(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            out = []
            for s in texts:
                if not s or len(s) < n:
                    out.append([0.0] * num_buckets)
                    continue
                data = np.frombuffer(s.lower().encode("utf-8"), dtype=np.uint8)
                m = len(data) - n + 1
                # vectorized n-gram hashing: polynomial over byte windows
                h = np.zeros(m, dtype=np.uint64)
                for j in range(n):
                    h = h * np.uint64(1000003) + data[j : j + m]
                counts = np.bincount(
                    (h % np.uint64(num_buckets)).astype(np.int64),
                    minlength=num_buckets,
                ).astype(np.float64)
                out.append(list(counts / counts.sum()))
            yield pd.Series(out)

    return df.select(
        F.col(id_col).cast("string").alias("id"),
        profile(F.col(text_col)).alias("ngram_profile"),
    )


@pandas_udf(T.DoubleType())
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """U5 grouped-agg pandas UDAF (Series -> scalar inside ``agg``).

    The one aggregate shape built-ins can't compose directly in a single
    pass (sum(v*w)/sum(w) needs two aggregates + a projection; a UDAF
    does it per group in one Arrow batch). Determinism note: callers
    feed integer-valued columns, so the float64 products and sums are
    exact (< 2^53) and the result is partition-order invariant — which
    is what lets a SQL oracle reproduce it bit-for-bit. Spark ships the
    WHOLE group to Python for a grouped-agg UDAF (no partial agg), so
    this is for moderate group counts over big groups; prefer built-in
    sum/sum composition when the expression is decomposable.
    """
    vv = v.to_numpy(dtype="float64")
    ww = w.to_numpy(dtype="float64")
    return float((vv * ww).sum() / max(ww.sum(), 1.0))


def doc_rolling_fingerprint(df: DataFrame, id_col: str, text_col: str,
                            seed: int = 42) -> DataFrame:
    """64-bit whole-document fingerprint (xxhash64 of normalized text) plus
    a first-256-char prefix hash — cheap exact-dup and near-head keys."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select(
        F.col(id_col).cast("string").alias("id"),
        F.xxhash64(norm, F.lit(seed)).alias("fp64"),
        F.xxhash64(F.substring(norm, 1, 256), F.lit(seed)).alias("fp_prefix256"),
    )


def char_entropy_col(text: Column) -> Column:
    """Unigram character entropy in bits/char — Shannon entropy of the
    document's character distribution, H = log2(n) − (Σ c·log2 c)/n over
    per-character counts c. Low values flag repetitive boilerplate and
    degenerate generations (the cheap stand-in for the compression-ratio
    filter in C4/Gopher-family pipelines); typical English prose sits
    near ~4.1 bits. Empty/NULL text scores 0.0.

    Pure projection: per-row array ops inside whole-stage codegen —
    zero shuffle, and the summation order is fixed by the row's own
    sorted character order, so the value is bit-deterministic under any
    partitioning. Counts come from a run-length scan of the SORTED char
    array (one aggregate() pass with a (prev, run, sum) accumulator),
    so per-row CPU is O(len log len) regardless of alphabet size — a
    distinct-chars × len nested scan would invert the zero-shuffle
    trade on large-alphabet (CJK) documents, where thousands of
    distinct chars × the doc length dwarf the explode+groupBy exchange
    this avoids. Characters are codepoints (Java's empty-pattern split
    advances per code point, surrogate pairs stay intact), matching
    DuckDB's string_split(x, '') — verified for supplementary-plane
    input.
    """
    chars = F.array_sort(F.filter(F.split(text, ""), lambda c: c != F.lit("")))
    n = F.size(chars)

    # Σ run·log2(run) over equal-char runs: flush the running count into
    # the partial sum at every char boundary, then once more at finish
    run_log = F.lit(0.0)

    def _flush(run: Column) -> Column:
        return F.when(
            run > 0, run.cast("double") * F.log2(run.cast("double"))
        ).otherwise(run_log)

    def _merge(acc: Column, c: Column) -> Column:
        return F.when(
            c == acc["prev"],
            F.struct(
                c.alias("prev"),
                (acc["run"] + F.lit(1)).alias("run"),
                acc["s"].alias("s"),
            ),
        ).otherwise(
            F.struct(
                c.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (acc["s"] + _flush(acc["run"])).alias("s"),
            )
        )

    s = F.aggregate(
        chars,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("s"),
        ),
        _merge,
        lambda acc: acc["s"] + _flush(acc["run"]),
    )
    return F.when(
        n > 0, F.log2(n.cast("double")) - s / n.cast("double")
    ).otherwise(F.lit(0.0))


def _word_ngrams(toks: Column, k: int) -> Column:
    """Array of space-joined word k-grams of an already-split token array;
    empty array when the doc has fewer than k tokens (guards Spark's
    descending-sequence quirk: sequence(0, -1) would yield [0, -1])."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.when(F.size(toks) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style intra-document repetition filters (Rae et al. '21,
    app. A1.1, simplified to gram counts): per document,

    - ``top_2gram_frac`` — share of all word-2-grams taken by the single
      most frequent 2-gram (boilerplate/chorus detector);
    - ``dup_3gram_frac`` — fraction of word-3-grams that are repeats of
      an earlier 3-gram in the same doc.

    Plan: the 3-gram fraction is array-native (``array_distinct`` inside
    the row — zero shuffle); the top-2-gram frequency explodes grams and
    runs two keyed aggregations on (id, gram) then (id) — partial
    (map-side) aggregation applies and the key space is ~tokens-per-doc
    wide, so it scales with corpus size, never quadratically per doc."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    base = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.split(norm, " ").alias("toks"),
    )
    g3 = _word_ngrams(F.col("toks"), 3)
    rep3 = base.select(
        "id",
        F.when(
            F.size("toks") >= 3,
            F.round(
                1.0 - F.size(F.array_distinct(g3))
                / (F.size("toks") - F.lit(2)).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
    )
    counts2 = (
        base.select("id", F.explode(_word_ngrams(F.col("toks"), 2)).alias("g"))
        .groupBy("id", "g")
        .agg(F.count("*").alias("c"))
    )
    agg2 = counts2.groupBy("id").agg(
        (F.max("c") / F.sum("c")).alias("f2")
    )
    return (
        rep3.join(agg2, "id", "left")
        .select(
            "id",
            F.round(F.coalesce(F.col("f2"), F.lit(0.0)), 6).alias("top_2gram_frac"),
            "dup_3gram_frac",
        )
    )


def decontaminate(df: DataFrame, id_col: str, text_col: str,
                  is_eval: Column, k: int = 4) -> DataFrame:
    """Benchmark-decontamination sweep (the GPT-3/PaLM appendix protocol:
    flag training docs sharing any word n-gram with a held-out eval set).

    ``is_eval`` marks the eval slice; the result is one row per NON-eval
    doc that shares >= 1 distinct word ``k``-gram with ANY eval doc, with
    the count of distinct shared grams.

    Plan: distinct grams per side (``array_distinct`` before explode keeps
    the exploded row count bounded by tokens-per-doc), equi-join on the
    gram string — AQE turns it into a broadcast join whenever the eval
    side is small (the common case: eval benchmarks are ~1e4 docs vs 1e9
    training docs), and the final count is a keyed agg with map-side
    partials. The corpus side never self-joins."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    grams = df.select(
        F.col(id_col).cast("string").alias("id"),
        is_eval.alias("is_eval"),
        F.explode(
            F.array_distinct(_word_ngrams(F.split(norm, " "), k))
        ).alias("g"),
    )
    ev = grams.filter("is_eval").select("g").distinct()
    corp = grams.filter(~F.col("is_eval")).select("id", "g")
    return (
        corp.join(ev, "g")
        .groupBy("id")
        .agg(F.count("*").alias(f"n_shared_{k}grams"))
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 5) -> DataFrame:
    """TF-IDF keyword extraction: top-``k`` terms per document by
    tf * (ln((N+1)/(df+1)) + 1) (the smoothed-idf formula sklearn uses),
    ties broken on term asc so the top-k set is deterministic.

    Plan: ONE shuffle builds the (id, term, tf) table (explode + keyed
    agg, map-side combined); document frequency re-aggregates THAT table
    (never re-scans the corpus); N rides in as a broadcast one-row cross
    join so the whole expression stays JVM-side. The ranking window
    partitions by doc — bounded by per-doc vocabulary, no global sort.
    Hot terms only widen the df agg, which partial-aggregates."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    tf = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(F.split(norm, " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1), 6
            ),
        )
    )
    from pyspark.sql import Window
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "df", "tfidf",
                F.col("rank").cast("long").alias("term_rank"))
    )


# --- Curation policy: composite keep/drop verdict ---------------------------

# Thresholds in one place so the Spark path, the DuckDB oracle, and the
# docs can't drift. Rule order matters: `reason` reports the FIRST
# failing rule (a fixed triage order makes drop-reason dashboards stable
# across reruns), so the tuple order below is part of the contract.
CURATION_RULES: dict[str, float] = {
    "min_tokens": 20,
    "max_tokens": 10_000,
    "min_mean_token_len": 2.0,
    "max_mean_token_len": 10.0,
    "min_diversity": 0.35,
    "max_digit_ratio": 0.20,
}


def curation_verdict(df: DataFrame, id_col: str, text_col: str,
                     rules: dict[str, float] | None = None) -> DataFrame:
    """C4/Gopher-style document curation: evaluate the cheap quality
    signals against a threshold policy and emit ``keep`` (0/1) plus the
    first failing rule name in ``reason`` (NULL when kept).

    Pure projection over the signal expressions — zero shuffle, one
    WholeStageCodegen span, scan-speed at any corpus size. Comparisons
    run on the UNROUNDED ratios (identical double arithmetic in any
    engine: int/int division then compare to the same literal), so the
    verdict is engine-portable; only the displayed columns are rounded.
    """
    r = CURATION_RULES if rules is None else rules
    text = F.col(text_col)
    # Raw (unrounded) signals — quality_columns rounds for display, but
    # threshold comparisons must see the exact ratios so engine and
    # oracle agree bit-for-bit.
    n_chars = F.length(text)
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != F.lit(""))
    toks_raw = F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))
    nt = F.size(toks).cast("long")
    # true mean token length (token chars / tokens) — the old
    # (nc - nt + 1)/nt shortcut counted whitespace runs as word length,
    # misdropping indented code/markdown docs as 'long_words'
    mtl = F.length(F.array_join(toks_raw, "")) / F.greatest(nt, F.lit(1))
    div = F.size(F.array_distinct(toks)) / F.greatest(nt, F.lit(1))
    dig = (
        n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    ) / F.greatest(n_chars, F.lit(1))
    reason = (
        F.when(nt < F.lit(int(r["min_tokens"])), "too_short")
        .when(nt > F.lit(int(r["max_tokens"])), "too_long")
        .when(mtl < F.lit(r["min_mean_token_len"]), "short_words")
        .when(mtl > F.lit(r["max_mean_token_len"]), "long_words")
        .when(div < F.lit(r["min_diversity"]), "low_diversity")
        .when(dig > F.lit(r["max_digit_ratio"]), "digit_heavy")
        .otherwise(F.lit(None).cast("string"))
    )
    return df.select(
        id_col,
        nt.alias("n_tokens"),
        F.round(mtl, 6).alias("mean_token_len"),
        F.round(div, 6).alias("diversity"),
        reason.alias("reason"),
        reason.isNull().cast("int").alias("keep"),
    )


def curation_oracle_sql(table: str, id_expr: str, text_expr: str,
                        rules: dict[str, float] | None = None) -> str:
    """DuckDB SQL replicating ``curation_verdict`` exactly — the same
    unrounded comparisons in the same rule order."""
    r = CURATION_RULES if rules is None else rules
    toks = (f"list_filter(string_split_regex(lower({text_expr}), '\\s+'),"
            f" x -> x <> '')")
    toks_raw = (f"list_filter(string_split_regex({text_expr}, '\\s+'),"
                f" x -> x <> '')")
    return f"""
        WITH t AS (
            SELECT {id_expr} AS id,
                   CAST(len({toks}) AS BIGINT) AS nt,
                   length({text_expr}) AS nc,
                   length(array_to_string({toks_raw}, '')) AS ntc,
                   len(list_distinct({toks})) AS ndt,
                   length(regexp_replace({text_expr}, '[0-9]', '', 'g'))
                       AS nc_nodigit
            FROM {table}
        ), s AS (
            SELECT id, nt,
                   ntc * 1.0 / greatest(nt, 1) AS mtl,
                   ndt * 1.0 / greatest(nt, 1) AS div,
                   (nc - nc_nodigit) * 1.0 / greatest(nc, 1) AS dig
            FROM t
        ), v AS (
            SELECT id, nt, mtl, div,
                   CASE
                       WHEN nt < {int(r["min_tokens"])} THEN 'too_short'
                       WHEN nt > {int(r["max_tokens"])} THEN 'too_long'
                       WHEN mtl < {r["min_mean_token_len"]} THEN 'short_words'
                       WHEN mtl > {r["max_mean_token_len"]} THEN 'long_words'
                       WHEN div < {r["min_diversity"]} THEN 'low_diversity'
                       WHEN dig > {r["max_digit_ratio"]} THEN 'digit_heavy'
                   END AS reason
            FROM s
        )
        SELECT id AS {id_expr}, nt AS n_tokens,
               round(mtl, 6) AS mean_token_len,
               round(div, 6) AS diversity, reason,
               CAST(reason IS NULL AS INT) AS keep
        FROM v
    """
