"""Text-analysis operators for training-data pipelines over `documents`.

All JVM-side (codegen'd built-ins) — no Python in the hot path. Each has a
DuckDB-expressible oracle (registered in __spark_entry__.oracle_sql) so the
driver's correctness gate covers them.

At 100 TB these are embarrassingly parallel narrow maps: they pipeline with
the parquet scan, prune to the columns they read, and never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seatunnel_spark.operators.spread import spread_small_input

# tiny deterministic stopword lists per language for the n-gram heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "que", "los", "de"],
}


def token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (chars/4 heuristic,
    the common rule-of-thumb for byte-pair encoders)."""
    return df.withColumn(
        "n_tokens_ws",
        F.size(F.split(F.trim(F.col(col)), r"\s+")),
    ).withColumn(
        "n_tokens_bpe_est",
        F.ceil(F.length(F.col(col)) / F.lit(4.0)).cast("bigint"),
    )


def quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristics (the standard
    C4/Gopher-style filters, re-expressed as codegen'd expressions)."""
    length = F.length(F.col(col))
    words = F.split(F.trim(F.col(col)), r"\s+")
    n_words = F.size(words)
    n_punct = length - F.length(F.regexp_replace(F.col(col), r"[.,;:!?]", ""))
    n_stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*_LANG_MARKERS["en"]))
    )
    mean_word_len = (length - n_words + 1) / n_words
    return (
        df.withColumn("n_chars_q", length.cast("bigint"))
        .withColumn("n_words", n_words.cast("bigint"))
        .withColumn("punct_ratio", F.round(n_punct / length, 6))
        .withColumn("stopword_ratio", F.round(n_stop / n_words, 6))
        .withColumn("mean_word_len", F.round(mean_word_len, 6))
        .withColumn(
            "quality_ok",
            (length >= 50) & (n_words >= 10) & (n_punct / length < 0.3),
        )
    )


def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by stopword hits, pick
    the argmax (deterministic tie-break by language code)."""
    words = F.split(F.lower(F.col(col)), r"\s+")
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        hits = F.size(F.filter(words, lambda w: w.isin(*markers)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("unknown")),
    )


def fingerprint(df: DataFrame, col: str = "text", out: str = "fp") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized text — a
    deterministic rolling-hash stand-in that DuckDB reproduces bit-for-bit."""
    normalized = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    return df.withColumn(out, F.md5(normalized))


# PII patterns: email, E.164-ish phone, IPv4 — the standard pre-training
# scrub set. POSIX-class-free so Spark (Java regex) and DuckDB (RE2) agree.
_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{1,3}[ -]?[0-9]{3}[ -]?[0-9]{3,4}[ -]?[0-9]{3,4}", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def pii_redact(df: DataFrame, col: str = "text") -> DataFrame:
    """PII scrub for training corpora: replace emails / phone numbers / IPv4
    addresses with typed placeholder tokens and count the hits per class —
    the redaction pass every web-scale pretraining pipeline runs before
    tokenization. Chained codegen'd regexp_replace, no Python, no shuffle;
    pipelines with the scan like the other text ops."""
    out = F.col(col)
    counts = []
    for name, pat, token in _PII_PATTERNS:
        n = (
            F.length(F.regexp_replace(out, pat, " "))
            - F.length(F.regexp_replace(out, pat, ""))
        )
        counts.append(n.cast("bigint").alias(f"n_{name}"))
        out = F.regexp_replace(out, pat, token)
    return df.select("*", out.alias("text_redacted"), *counts)


def repetition_stats(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Within-document repetition signals — the Gopher/RefinedWeb quality
    filters for catching degenerate (looping/boilerplate) documents:

    - ``dup_word_frac``: 1 − distinct words / total words
    - ``dup_2gram_frac``: 1 − distinct word-bigrams / total bigrams
    - ``top_word_frac``: occurrences of the most frequent word / total words

    Shape at scale: a PURE per-document map — every statistic is a
    function of one document's token multiset, so nothing needs to leave
    its row. Distinct counts come from ``array_distinct``; the top-word
    count is the longest run in the sorted token array (one
    ``array_sort`` + one linear fold per row). The previous
    explode → groupBy(doc, token) → groupBy(doc) → join form shuffled
    every token twice and re-joined per doc — at 100 TB that is two
    corpus-wide exchanges for numbers each scan task already had in
    hand; the map form has ZERO exchanges and pipelines with the scan.
    Counts are exact integers either way, so results are identical.
    Returns one row per document:
    (doc_id, n_words, dup_word_frac, dup_2gram_frac, top_word_frac)."""
    words = F.split(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), " ")
    # null text produced no exploded rows (and thus no output row) in the
    # aggregate form; reproduce that contract explicitly
    base = (
        spread_small_input(df)
        .select(F.col(id_col), words.alias("w"))
        .where(F.col("w").isNotNull())
    )
    g2 = F.zip_with(
        F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
        F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    # longest run in the sorted array == max token multiplicity (top_c)
    run0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("top"),
    )

    def run_step(acc, x):
        run = (
            F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("bigint"))
            .otherwise(F.lit(1).cast("bigint"))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["top"], run).alias("top")
        )

    top_c = F.aggregate(F.array_sort(F.col("w")), run0, run_step)["top"]
    n_words = F.size("w").cast("bigint")
    n_distinct = F.size(F.array_distinct(F.col("w"))).cast("bigint")
    n_g = F.size(g2).cast("bigint")
    n_g_distinct = F.size(F.array_distinct(g2)).cast("bigint")
    return base.select(
        id_col,
        n_words.alias("n_words"),
        F.round(1 - n_distinct / n_words, 6).alias("dup_word_frac"),
        # n_g can be 0 (single-word doc): the aggregate form yielded no
        # gram row -> left-join null -> 0.0; guard the division (ANSI-safe)
        F.when(n_g > 0, F.round(1 - n_g_distinct / n_g, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
        F.round(top_c / n_words, 6).alias("top_word_frac"),
    )


def line_stats(df: DataFrame, id_col: str = "doc_id", col: str = "text") -> DataFrame:
    """Line-level quality signals — the remaining Gopher document filters
    (the word-level ones live in quality_score/repetition_stats):

    - ``n_lines``: newline-split line count
    - ``bullet_line_frac``: fraction of lines starting with a bullet
      marker (-, *, •) — boilerplate/list-dump detector
    - ``ellipsis_line_frac``: fraction of lines ending with "..." or "…"
      — truncated-scrape detector
    - ``symbol_word_ratio``: (# or ... occurrences) / words — the Gopher
      symbol-to-word rule

    Pure codegen'd expressions over the line array: no explode, no
    shuffle — a narrow map the scan pipeline absorbs."""
    lines = F.split(F.col(col), "\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    )
    ellipsis = F.size(
        F.filter(lines, lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"))
    )
    words = F.split(F.regexp_replace(F.trim(F.col(col)), r"\s+", " "), " ")
    n_words = F.size(words)
    n_hash = F.length(F.col(col)) - F.length(F.regexp_replace(F.col(col), "#", ""))
    n_ell = (
        F.length(F.regexp_replace(F.col(col), r"\.\.\.", "~"))
        - F.length(F.regexp_replace(F.col(col), r"\.\.\.", ""))
    )
    return df.select(
        F.col(id_col),
        n_lines.cast("bigint").alias("n_lines"),
        F.round(bullet / n_lines, 6).alias("bullet_line_frac"),
        F.round(ellipsis / n_lines, 6).alias("ellipsis_line_frac"),
        F.round((n_hash + n_ell) / n_words, 6).alias("symbol_word_ratio"),
    )


def line_dedup_stats(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Cross-document repeated-line (boilerplate) detection — the line-level
    dedup step of CCNet / RefinedWeb-style web curation: a normalized
    (trimmed, non-empty) line appearing in >= ``min_docs`` DISTINCT
    documents is boilerplate (nav bars, cookie banners, footers). Returns
    per-document removal stats ``(doc_id, n_lines, n_boiler_lines,
    boiler_line_ppm)`` — the numbers the cleaning pass filters/rewrites by.

    100 TB shape: the explode emits (doc_id, 48-bit line digest) — line
    TEXT never shuffles. Document frequency is one digest-keyed aggregate
    (map-side combinable); membership is a second digest-keyed join (the
    boilerplate set is the head of the line-frequency distribution — tiny
    next to the corpus — and AQE broadcasts it when it fits); the per-doc
    rollup re-shuffles only (doc_id, flag). ppm uses integral `div`: exact,
    and n_boiler * 10^6 stays far inside int64 for any real document."""
    from seatunnel_spark.operators.dedup_docs import _h48

    lines = (
        spread_small_input(df)
        .select(F.col(id_col), F.explode(F.split(F.col(col), "\n")).alias("ln"))
        .select(id_col, F.trim(F.col("ln")).alias("ln"))
        .where(F.col("ln") != "")
        .select(id_col, _h48(F.col("ln"), "line").alias("lh"))
    )
    doc_freq = lines.distinct().groupBy("lh").agg(
        F.count("*").alias("df_docs")
    )
    boiler = doc_freq.where(F.col("df_docs") >= int(min_docs)).select(
        "lh", F.lit(1).alias("_b")
    )
    return (
        lines.join(boiler, "lh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.count("_b").cast("bigint").alias("n_boiler_lines"),
        )
        .select(
            id_col,
            "n_lines",
            "n_boiler_lines",
            F.expr(
                "CAST((n_boiler_lines * 1000000) div n_lines AS BIGINT)"
            ).alias("boiler_line_ppm"),
        )
    )


def token_rarity(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Unigram-LM quality proxy in exact integer space — the KenLM-style
    "does this document's token distribution look like the corpus" filter
    without the float log: each token's corpus frequency becomes ppm-of-
    corpus (``(tf * 10^6) div total_tokens``), and a document scores the
    integral mean of its tokens' ppm. Common-token documents (boilerplate,
    templates) score high; rare-token documents (garbled text, code dumps
    in a prose corpus) score low — both tails are what real pipelines cut.
    Returns (doc_id, n_tokens, mean_tf_ppm, min_tf_ppm, n_hapax) where
    ``n_hapax`` counts corpus-hapax tokens (tf = 1) in the doc.

    100 TB shape: tokens shuffle as 48-bit digests; the frequency table is
    one map-side-combinable agg; the corpus total is a broadcast scalar.
    ``tf * 10^6`` exceeds int64 once a corpus passes ~9 x 10^12 tokens, so
    the ppm math runs in decimal(38,0) with integral `div` — the same
    overflow discipline as curation.thresholds_from_counts."""
    from seatunnel_spark.operators.dedup_docs import _h48

    toks = (
        spread_small_input(df).select(
            F.col(id_col),
            F.explode(
                F.split(
                    F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "),
                    " ",
                )
            ).alias("t"),
        )
        .where(F.col("t") != "")
        .select(id_col, _h48(F.col("t"), "tok").alias("th"))
    )
    tf = toks.groupBy("th").agg(F.count("*").alias("tf"))
    tot = tf.agg(F.sum("tf").alias("_tot"))
    dec = "decimal(38,0)"
    fppm = tf.crossJoin(F.broadcast(tot)).select(
        "th",
        "tf",
        F.expr(f"CAST((CAST(tf AS {dec}) * 1000000) div _tot AS BIGINT)").alias(
            "fppm"
        ),
    )
    return (
        toks.join(fppm, "th")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("fppm").alias("_sum_fppm"),
            F.min("fppm").cast("bigint").alias("min_tf_ppm"),
            F.sum(F.when(F.col("tf") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hapax"),
        )
        .select(
            id_col,
            "n_tokens",
            F.expr(
                f"CAST(CAST(_sum_fppm AS {dec}) div n_tokens AS BIGINT)"
            ).alias("mean_tf_ppm"),
            "min_tf_ppm",
            "n_hapax",
        )
    )


def repeated_spans(
    df: DataFrame,
    window: int = 40,
    stride: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Cross-document repeated-substring detection — the distributed shape
    of exact-substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better"): instead of a global suffix array
    (inherently sequential), slide fixed ``window``-char spans at
    ``stride`` over each normalized document, hash each span, and count
    how many DISTINCT documents share it. A span in >= ``min_docs`` docs
    marks verbatim cross-document text (licenses, templates, quoted
    chunks). Returns (doc_id, n_spans, n_repeated_spans,
    repeated_span_ppm) — the per-doc removal signal; stride trades recall
    for cost (stride <= window/2 guarantees every repeated region >=
    2*window chars still overlaps some span on both sides up to
    alignment, the standard windowed approximation).

    100 TB shape: spans shuffle as 48-bit digests (the span text never
    leaves the scan); frequency is one map-side-combinable agg; docs
    shorter than ``window`` contribute their whole text as one span."""
    from seatunnel_spark.operators.dedup_docs import _h48

    norm = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    n = F.greatest(
        (F.length(norm) - F.lit(window)).cast("int"), F.lit(0)
    )
    starts = F.transform(
        F.sequence(F.lit(0), F.floor(n / stride).cast("int")),
        lambda i: i * stride + 1,
    )
    spans = spread_small_input(df).select(
        F.col(id_col),
        F.explode(
            F.transform(starts, lambda s: F.substring(norm, s, window))
        ).alias("sp"),
    ).select(id_col, _h48(F.col("sp"), "span").alias("sh"))
    freq = spans.distinct().groupBy("sh").agg(F.count("*").alias("df_docs"))
    rep = freq.where(F.col("df_docs") >= int(min_docs)).select(
        "sh", F.lit(1).alias("_r")
    )
    return (
        spans.join(rep, "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_spans"),
            F.count("_r").cast("bigint").alias("n_repeated_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_repeated_spans",
            F.expr(
                "CAST((n_repeated_spans * 1000000) div n_spans AS BIGINT)"
            ).alias("repeated_span_ppm"),
        )
    )


def ngram_novelty(
    df: DataFrame, n: int = 13, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Per-document n-gram novelty — the inverse of corpus-wide n-gram
    duplication (the RefinedWeb/Dolma "fraction of document duplicated
    elsewhere" audit signal, at the 13-gram granularity GPT-3-style
    decontamination uses): for each doc, the exact fraction of its
    DISTINCT word n-grams that occur in no other document. High novelty =
    genuinely new text; low novelty = assembled from corpus-repeated
    chunks even when no single pairwise near-dup exists (the case
    doc-level MinHash misses). Returns (doc_id, n_grams, n_shared,
    novelty_ppm) with novelty_ppm = (n_grams - n_shared) * 10^6 div
    n_grams, exact integer arithmetic.

    100 TB shape: grams shuffle as 48-bit digests only; the
    docs-per-gram frequency is one map-side-combinable aggregate (a doc's
    grams are pre-distinct, so partial counts are exact); the join back
    is digest-keyed. Docs shorter than ``n`` words contribute their whole
    text as one gram (same floor as curation._ngrams)."""
    from seatunnel_spark.operators.curation import _ngrams
    from seatunnel_spark.operators.dedup_docs import _h48

    grams = spread_small_input(df).select(
        F.col(id_col),
        F.explode(F.array_distinct(_ngrams(col, n))).alias("g"),
    ).select(id_col, _h48(F.col("g"), "novel").alias("gh"))
    ndocs = grams.groupBy("gh").agg(F.count("*").alias("n_docs"))
    return (
        grams.join(ndocs, "gh")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
        .select(
            id_col,
            "n_grams",
            "n_shared",
            F.expr(
                "CAST(((n_grams - n_shared) * 1000000) div n_grams AS BIGINT)"
            ).alias("novelty_ppm"),
        )
    )


def vocab_top_tokens(
    df: DataFrame, top_n: int = 100, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Corpus vocabulary head: the ``top_n`` most frequent whitespace
    tokens with exact counts and a deterministic rank (ties broken by
    token string) — the tokenizer-training / stopword-calibration view
    every corpus build starts from, and the denominator audit for
    token_rarity's ppm table. Returns (rank, token, tf).

    100 TB shape: one map-side-combinable (token → count) aggregate —
    the only shuffle, carrying one row per distinct token — then a
    global top-k (Spark TakeOrdered: per-partition heaps, no full sort);
    the final row_number window runs over top_n rows on the driver-side
    single partition, which is exactly k rows by then."""
    from pyspark.sql import Window

    toks = spread_small_input(df).select(
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "), " ")
        ).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("tf"))
    top = tf.orderBy(F.col("tf").desc(), F.col("token")).limit(int(top_n))
    w = Window.orderBy(F.col("tf").desc(), F.col("token"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"), "token", "tf"
    )


def char_diversity(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Character-level diversity gate — catches mojibake, binary spills,
    and single-character floods that word-level stats miss. Entropy needs
    a transcendental log (not exactly rounded across engines), so the
    score is the SIMPSON index — the collision probability
    sum(c_i*(c_i-1)) / (n*(n-1)) over the normalized text's character
    histogram — which is a pure integer rational: bit-exact on any
    engine. Low simpson_ppm = diverse text; near 10^6 = one character
    repeated. Returns (doc_id, n_chars, distinct_chars, simpson_ppm,
    top_char_ppm); single-char docs define simpson_ppm = 10^6.

    100 TB shape: explode is a narrow map and the (doc, char) aggregate
    is map-side combinable — after partial combine at most
    |alphabet| rows per doc per partition shuffle; the per-doc rollup
    reuses the same doc-keyed partitioning."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")
    chars = spread_small_input(df).select(
        F.col(id_col), F.explode(F.split(norm, "")).alias("ch")
    ).where(F.col("ch") != "")
    hist = chars.groupBy(id_col, "ch").agg(F.count("*").alias("c"))
    return (
        hist.groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("n_chars"),
            F.count("*").cast("bigint").alias("distinct_chars"),
            F.sum(F.col("c") * (F.col("c") - 1)).cast("bigint").alias("_coll"),
            F.max("c").cast("bigint").alias("_top"),
        )
        .select(
            id_col,
            "n_chars",
            "distinct_chars",
            # decimal(38,0): _coll is O(n^2), so bigint*10^6 would overflow
            # past ~3e6-char docs — same discipline as token_rarity
            F.expr(
                "CAST(CASE WHEN n_chars > 1 THEN (CAST(_coll AS DECIMAL(38,0)) * 1000000) div (CAST(n_chars AS DECIMAL(38,0)) * (n_chars - 1)) ELSE 1000000 END AS BIGINT)"
            ).alias("simpson_ppm"),
            F.expr("CAST((_top * 1000000) div n_chars AS BIGINT)").alias(
                "top_char_ppm"
            ),
        )
    )


def bigram_surprise(
    df: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> DataFrame:
    """Bigram-LM fluency proxy in exact integer space — the CCNet-style
    "perplexity under a corpus LM" filter without the float log: every
    bigram's conditional likelihood P(w2|w1) = bigram_count/prefix_count
    is quantized to integer SURPRISE BITS floor-log2-style,
    ``length(bin(prefix+1)) - length(bin(bigram+1))``, exact string
    arithmetic on any engine (same quantization as curation.dsir_scores;
    swap in ln() when bit-exact replay isn't required). High mean bits =
    improbable word transitions (garbled text, word salad); near-zero =
    boilerplate whose every transition the corpus has memorized — the two
    tails CCNet's head/tail buckets cut. Returns (doc_id, n_bigrams,
    sum_bits, mean_centibits) with mean_centibits = (sum*100) div n.

    100 TB shape: ONE corpus bigram aggregate keyed on 48-bit digests
    (map-side combinable) serves as both models — the prefix model is a
    re-aggregation of the bigram model on the prefix digest, so text
    tokenizes exactly once and only (digest, count) rows ever shuffle.
    Doc scoring is two digest-keyed joins + a doc-keyed rollup; no
    broadcast needed (the models scale with vocabulary, not corpus)."""
    from seatunnel_spark.operators.curation import _ngrams
    from seatunnel_spark.operators.dedup_docs import _h48

    pairs = spread_small_input(df).select(
        F.col(id_col), F.explode(_ngrams(col, 2)).alias("g")
    ).select(
        id_col,
        _h48(F.col("g"), "blm").alias("hg"),
        _h48(F.substring_index(F.col("g"), " ", 1), "blm-p").alias("hp"),
    )
    # one aggregate carries both digests; the prefix model re-aggregates it
    bg = pairs.groupBy("hg", "hp").agg(F.count("*").alias("bc"))
    pf = bg.groupBy("hp").agg(F.sum("bc").alias("pc"))
    model = bg.join(pf, "hp").select(
        "hg",
        "hp",
        (F.length(F.bin(F.col("pc") + 1)) - F.length(F.bin(F.col("bc") + 1)))
        .cast("bigint")
        .alias("bits"),
    )
    return (
        pairs.join(model, ["hg", "hp"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("bits").cast("bigint").alias("sum_bits"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_bits",
            F.expr("CAST((sum_bits * 100) div n_bigrams AS BIGINT)").alias(
                "mean_centibits"
            ),
        )
    )
