"""Distributed BPE vocabulary training (byte-pair encoding, Sennrich et al.
2016) — the tokenizer-training step of an LLM data pipeline, shaped for a
100 TB corpus.

Design (the same shape every real BPE trainer uses, distributed):

1. ONE corpus-scale aggregate reduces the raw text to a (word, count)
   table — map-side combinable, the only shuffle that sees corpus-sized
   data. Everything after runs on the DISTINCT-word table, which is
   vocabulary-bounded (tens of millions of rows at worst), cached.
2. Each merge iteration counts adjacent symbol pairs over that compact
   table (weighted by word count — a narrow explode + one small agg),
   picks the most frequent pair on the driver (count desc, then
   lexicographic — fully deterministic), and applies the merge to every
   word's segmentation.
3. Driver state is just the merge list: n_merges rows.

Segmentations are space-joined symbol strings padded with one leading and
trailing space (``' l o w </w> '``), so a merge is a LITERAL string
replacement ``' l o ' -> ' lo '`` — a codegen'd expression, no UDF. A
single left-to-right replace pass misses occurrences that share a
delimiter space with a previous match (``a b a b``), so each merge applies
``passes`` replace passes; every pass at least halves the unmerged
occurrences in such runs, so runs up to ~2**passes adjacent occurrences
resolve exactly, and longer runs degrade DETERMINISTICALLY (identical in
any engine applying the same passes — the bit-exactness contract the
DuckDB oracle needs; textbook greedy BPE differs only past that bound).

The ``</w>`` end-of-word marker is the standard Sennrich convention; a
document whose characters merge into the literal string ``</w>`` would
alias it (theoretical; harmless to determinism since every engine computes
the same table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGES_SCHEMA = (
    "merge_rank bigint, left string, right string, merged string, pair_count bigint"
)


def bpe_word_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Corpus → (word, count): lowercase, whitespace-tokenize, one
    map-side-combinable aggregate. The only corpus-sized shuffle in BPE
    training; its output is vocabulary-bounded."""
    toks = df.select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), " ")
        ).alias("w")
    ).where(F.col("w") != "")
    return toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("n"))


def _initial_segments(wc: DataFrame) -> DataFrame:
    chars = F.array_remove(F.split(F.col("w"), ""), "")
    seg = F.concat(F.lit(" "), F.concat_ws(" ", chars), F.lit(" </w> "))
    return wc.select("n", seg.alias("seg"))


def _pair_counts(segs: DataFrame) -> DataFrame:
    return (
        segs.withColumn("t", F.split(F.trim(F.col("seg")), " "))
        .select(
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS l, t[i+1] AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 4,
    col: str = "text",
    min_freq: int = 2,
    passes: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus. Returns the merge
    table (merge_rank, left, right, merged, pair_count) — the artifact a
    tokenizer consumes, n_merges rows. Stops early when no pair reaches
    ``min_freq``.

    100 TB shape: one corpus aggregate (bpe_word_counts), then every
    iteration touches only the cached word table — pair counting is a
    narrow explode into a small agg (symbols, never text, cross the
    shuffle) and the merge application is ``passes`` codegen'd literal
    replaces. The driver holds n_merges (left, right, count) triples and
    one LIMIT-1 row per iteration."""
    spark = df.sparkSession
    if n_merges < 1:
        return spark.createDataFrame([], MERGES_SCHEMA)
    cur = _initial_segments(bpe_word_counts(df, col)).localCheckpoint(eager=True)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(cur)
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_freq:
            break
        lft, rgt, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merged = lft + rgt
        pat, rep = f" {lft} {rgt} ", f" {merged} "
        seg = F.col("seg")
        for _ in range(max(1, passes)):
            seg = F.replace(seg, F.lit(pat), F.lit(rep))
        cur = cur.select("n", seg.alias("seg")).localCheckpoint(eager=True)
        merges.append((rank, lft, rgt, merged, cnt))
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    col: str = "text",
    passes: int = 4,
) -> DataFrame:
    """Apply a learned merge list to documents: per doc, (BPE token, count)
    rows plus the doc's total token count — the tokenize step, as pure
    expressions (len(merges) * passes chained literal replaces, zero
    shuffle until the final per-doc count).

    ``merges`` is [(left, right), ...] in rank order (driver-side, the
    artifact bpe_train returns)."""
    words = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), " ")
        ).alias("w"),
    ).where(F.col("w") != "")
    chars = F.array_remove(F.split(F.col("w"), ""), "")
    seg = F.concat(F.lit(" "), F.concat_ws(" ", chars), F.lit(" </w> "))
    for lft, rgt in merges:
        pat, rep = f" {lft} {rgt} ", f" {lft}{rgt} "
        for _ in range(max(1, passes)):
            seg = F.replace(seg, F.lit(pat), F.lit(rep))
    toks = words.select(
        id_col, F.explode(F.split(F.trim(seg), " ")).alias("token")
    )
    return toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
