"""Paragraph-level corpus deduplication and boilerplate mining — the
RefinedWeb/CCNet-style intra-document cleanup pass that runs *beside*
whole-document dedup in a training-data pipeline: repeated paragraphs
(headers, footers, license blocks, navigation chrome) are removed
corpus-wide keeping one canonical occurrence, and the highest-
document-frequency n-grams are surfaced as a boilerplate inventory.

Everything here is pure SQL (JVM, whole-stage codegen) — no Python in
any hot path — and every output is DuckDB-oracle-able.

Scale shape (the 100-TB story):
  * the duplicate-paragraph inventory groupBy shuffles only
    ``(16-byte md5, id, para_idx)`` — paragraph TEXT never rides the
    hash exchange;
  * the keeper join is keyed on the md5 and restricted to hashes with
    >= ``min_copies`` occurrences, so its build side is the duplicate
    inventory (output-sized), not the corpus — AQE broadcasts it when
    small;
  * document rebuild is the reassembly discipline: ONE shuffle keyed by
    doc id + in-group ``sort_array`` (no window over the corpus);
  * boilerplate mining applies ``array_distinct`` per document BEFORE
    the global count, so the exchange carries one row per (doc, gram)
    and the count benefits from map-side partial aggregation; top-k
    plans as TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_paragraphs(
    docs: DataFrame, id_col: str, text_col: str, delim: str = r"\n{2,}"
) -> DataFrame:
    """(id, text) -> (id, para_idx, para): posexplode of a regex split,
    blank segments removed. ``para_idx`` is the position in the ORIGINAL
    split so rewrites preserve relative order. Narrow (shuffle-free)."""
    parts = F.split(F.col(text_col), delim)
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.posexplode(parts).alias("para_idx", "para"),
        )
        .filter(F.trim(F.col("para")) != "")
    )


def dedup_paragraphs(
    paras: DataFrame,
    id_col: str = "id",
    idx_col: str = "para_idx",
    text_col: str = "para",
    *,
    key: Column | None = None,
    min_copies: int = 2,
) -> DataFrame:
    """Corpus-wide paragraph dedup: for every paragraph occurring
    ``min_copies``+ times (by ``key``, default the exact text), keep the
    globally-first occurrence — min ``(id, idx)`` — and drop the rest.

    Returns the kept paragraphs (same schema as the input). Determinism:
    the keeper is a pure function of the data, independent of
    partitioning, because ``(id, idx)`` uniquely identifies a row.

    Plan: one groupBy on the 16-byte md5 (min(struct) is map-side
    combining), one equi-join back restricted to duplicated hashes.
    """
    p = paras.withColumn("_ph", F.md5(key if key is not None else F.col(text_col)))
    dups = (
        p.groupBy("_ph")
        .agg(
            F.count("*").alias("_n_copies"),
            F.min(F.struct(F.col(id_col).alias("i"), F.col(idx_col).alias("x"))).alias(
                "_keeper"
            ),
        )
        .filter(F.col("_n_copies") >= min_copies)
    )
    j = p.join(dups, "_ph", "left")
    kept = j.filter(
        F.col("_n_copies").isNull()
        | (
            (F.col("_keeper.i") == F.col(id_col))
            & (F.col("_keeper.x") == F.col(idx_col))
        )
    )
    return kept.drop("_ph", "_n_copies", "_keeper")


def rebuild_docs(
    kept: DataFrame,
    id_col: str = "id",
    idx_col: str = "para_idx",
    text_col: str = "para",
    delim: str = "\n\n",
) -> DataFrame:
    """Kept paragraphs -> (id, clean_text, n_paras): ONE shuffle keyed by
    doc id, order restored by in-group ``sort_array`` on (idx, text).
    Documents whose every paragraph was dropped produce no row (callers
    needing them can left-join from the doc table)."""
    ordered = F.sort_array(
        F.collect_list(F.struct(F.col(idx_col).alias("x"), F.col(text_col).alias("t")))
    )
    return (
        kept.groupBy(F.col(id_col).alias("id"))
        .agg(ordered.alias("_ps"))
        .select(
            "id",
            F.concat_ws(delim, F.transform("_ps", lambda s: s["t"])).alias(
                "clean_text"
            ),
            F.size("_ps").cast("int").alias("n_paras"),
        )
    )


def remove_duplicate_paragraphs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    split_delim: str = r"\n{2,}",
    join_delim: str = "\n\n",
    *,
    min_copies: int = 2,
) -> DataFrame:
    """End-to-end document rewrite: split -> corpus-wide dedup -> rebuild.
    Output: (id, clean_text, n_paras) for every doc that kept >= 1
    paragraph."""
    paras = split_paragraphs(docs, id_col, text_col, split_delim)
    kept = dedup_paragraphs(paras, min_copies=min_copies)
    return rebuild_docs(kept, delim=join_delim)


def ngram_strings_col(toks: Column, n: int) -> Column:
    """Array of word n-gram STRINGS over a token array (JVM transform +
    slice + array_join; the hash-free twin of shingle.py's xxhash64
    shingles, for human-readable inventories and cross-engine oracles)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def frequent_ngrams(
    docs: DataFrame,
    id_col: str,
    tokens_col: Column,
    n: int = 3,
    top_k: int = 20,
) -> DataFrame:
    """Boilerplate mining: the ``top_k`` n-grams by DOCUMENT frequency
    (each doc votes once per distinct gram — array_distinct applied
    map-side, so the exchange is (doc, gram)-deduped before it ships).
    Deterministic order: doc_freq desc, gram asc. Output:
    (gram, doc_freq)."""
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(ngram_strings_col(tokens_col, n))).alias("gram"),
    )
    counts = grams.groupBy("gram").agg(F.count("*").cast("long").alias("doc_freq"))
    return counts.orderBy(F.desc("doc_freq"), F.asc("gram")).limit(top_k)


def bigram_lm_scores(docs: DataFrame, id_col: str, tokens_col: Column) -> DataFrame:
    """CCNet-style LM quality proxy: an add-one-smoothed bigram language
    model is fit on the corpus itself (standing in for KenLM, which
    needs external model files), and every document is scored by the
    mean negative log-likelihood of its bigrams — low = typical text,
    high = rare/garbled. ``p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)``
    with V = corpus distinct-unigram count.

    Output: (id, n_bigrams, mean_nll) — mean_nll rounded to 6 dp (double
    log/sum, cross-engine reproducible at that precision); docs with
    < 2 tokens are absent (no bigrams to score).

    Scale: three corpus-token-scale exchanges (unigram counts, bigram
    counts, per-doc regroup) plus two equi-joins whose build sides are
    the count tables — AQE broadcasts them when the vocabulary is small;
    at web scale they sort-merge on the gram key, which is exactly the
    plan a count-based LM wants. No Python anywhere.
    """
    t = docs.select(F.col(id_col).alias("id"), tokens_col.alias("toks"))
    uni = t.select(F.explode("toks").alias("w1"))
    c1 = uni.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = c1.select(F.count("*").cast("long").alias("v"))

    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("w1"),
                        F.array_join(F.slice("toks", i, 2), " ").alias("bg"),
                    ),
                )
            ).alias("g"),
        )
        .select("id", "g.w1", "g.bg")
    )
    c12 = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    scored = (
        bg.join(c12, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "id",
            (-F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v")))).alias("nll"),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("nll"), 6).alias("mean_nll"),
    )
