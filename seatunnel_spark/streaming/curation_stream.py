"""Streaming corpus curation: the batch cleaning operators composed onto an
unbounded document stream with bounded state.

A training-data pipeline's ingest side is a stream (crawl batches, upload
feeds); the curation rules are the batch suite's (operators/text.py,
operators/dedup_docs.py) — pure codegen'd expressions, so they apply to a
streaming DataFrame unchanged. The one genuinely stateful step is exact
dedup across micro-batches: Spark's ``dropDuplicatesWithinWatermark``
keeps one state row per fingerprint and EVICTS it once the watermark
passes — bounded state, the only kind that survives an unbounded stream.
(Plain ``dropDuplicates`` on a stream grows state forever; the watermark
variant is the scale-correct form.)

Contract: a duplicate arriving within the watermark delay of its first
sighting is dropped; one arriving later may be re-admitted — at 100 TB
that tail is the batch dedup's job (minhash/exact over the landed corpus),
exactly how production pipelines split stream-time vs compaction-time
dedup. State is keyed by the 32-char md5 fingerprint, never the text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from seatunnel_spark.operators.text import quality_score


def doc_fingerprint(col: str = "text") -> F.Column:
    """Whitespace-normalized md5 — identical to operators/dedup_docs.
    exact_dedup's grouping key, so stream-time and compaction-time dedup
    agree on what "exact duplicate" means."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "))


def stream_dedup_exact(
    docs: DataFrame,
    ts_col: str = "ts",
    col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup across micro-batches with watermark-bounded state: the
    first arrival of each fingerprint passes, duplicates within the
    watermark window are dropped, state evicts at the watermark. Works on
    batch DataFrames too (falls back to plain dropDuplicates — batch has
    no unbounded-state problem)."""
    with_fp = docs.withColumn("_fp", doc_fingerprint(col))
    if not docs.isStreaming:
        return with_fp.dropDuplicates(["_fp"]).drop("_fp")
    return (
        with_fp.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def stream_corpus_clean(
    docs: DataFrame,
    ts_col: str = "ts",
    col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming cleaning stage: quality gate (pure expressions — C4/Gopher
    heuristics) THEN watermarked exact dedup. Filter-before-dedup keeps
    junk documents out of the dedup state entirely — state size tracks the
    accepted corpus, not the crawl."""
    q = quality_score(docs, col).where(F.col("quality_ok"))
    q = q.select(docs.columns)  # quality columns were only the gate
    return stream_dedup_exact(q, ts_col=ts_col, col=col, watermark=watermark)


class NearDupStore:
    """Bounded recent-signature store for stream-time NEAR-dedup: LSH band
    hashes of recently accepted documents, evicted past the watermark.

    Per micro-batch: (1) within-batch near-dups collapse through the batch
    spine (capped LSH pairs + ≥2-band pregate + Jaccard verify + connected
    components — identical semantics to the compaction-time dedup); (2) a
    surviving doc colliding with the store in ≥ ``min_band_matches`` bands
    is dropped as a near-dup of a recently accepted doc (no text is stored,
    so the cross-batch decision is band-collision-approximate — exactly the
    precision the ≥2-band pregate admits; the landed-zone compaction stays
    the exact verify); (3) survivors' band rows enter the store, rows older
    than the watermark leave. State is (band, bh, ts) per accepted doc —
    b rows each, never text, bounded by the watermark window.

    Restart safety: the store is PARTITIONED BY EPOCH
    (``store_dir/epoch=N/``). A batch filters against every epoch EXCEPT
    its own and overwrites only its own partition, so a crash-replayed
    micro-batch (foreachBatch redelivers the in-flight epoch) re-filters
    against exactly the pre-crash state instead of colliding with its own
    half-written bands — without this, every doc of a replayed batch
    would vanish as a "near-dup of itself". Eviction drops whole epoch
    partitions whose max event time fell behind the watermark horizon —
    the partition-drop shape a 100 TB deployment uses on the lake table."""

    def __init__(
        self,
        store_dir: str,
        watermark_s: int = 3600,
        k: int = 16,
        bands: int = 4,
        min_band_matches: int = 2,
        max_bucket: int = 64,
        jaccard_threshold: float = 0.2,
        pair_policy: str = "star",
    ) -> None:
        self.store_dir = store_dir
        self.watermark_s = int(watermark_s)
        self.k, self.bands = k, bands
        self.min_band_matches = min_band_matches
        self.max_bucket = max_bucket
        self.jaccard_threshold = jaccard_threshold
        # star = bucket-min→member edges (n−1 per bucket, not C(n,2)):
        # the same ~n/2 verify-stage cut the batch compaction spine took in
        # round 5 — cluster membership after label propagation is identical
        # because every bucket member still connects through the bucket min.
        self.pair_policy = pair_policy

    def _epochs(self) -> list[int]:
        import os

        if not os.path.isdir(self.store_dir):
            return []
        out = []
        for d in os.listdir(self.store_dir):
            if d.startswith("epoch="):
                try:
                    out.append(int(d.split("=", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)

    def _load(self, spark, exclude_epoch: int | None = None):
        import os

        dirs = [
            os.path.join(self.store_dir, f"epoch={e}")
            for e in self._epochs()
            if e != exclude_epoch
        ]
        if not dirs:
            return None
        try:
            return spark.read.parquet(*dirs)
        except Exception:
            return None

    def filter_batch(
        self,
        batch: DataFrame,
        epoch_id: int = 0,
        id_col: str = "doc_id",
        col: str = "text",
        ts_col: str = "ts",
    ) -> DataFrame:
        """One micro-batch through the near-dup gate; returns survivors and
        advances the store (own-epoch overwrite + horizon eviction) as a
        side effect. Calling again with the SAME epoch_id (crash replay)
        reproduces the same survivors."""
        from seatunnel_spark.operators.dedup_docs import (
            band_hashes,
            dup_clusters,
            minhash_lsh_pairs,
            minhash_signatures,
            ngram_jaccard,
        )

        spark = batch.sparkSession
        batch = batch.localCheckpoint(eager=True)  # read once: gate + bands

        # (1) within-batch near-dup canonicalization — the batch spine
        pairs = minhash_lsh_pairs(
            batch, id_col, col, self.k, self.bands,
            max_bucket=self.max_bucket, min_band_matches=self.min_band_matches,
            pair_policy=self.pair_policy,
        )
        verified = ngram_jaccard(batch, pairs, id_col, col).where(
            F.col("jaccard") >= self.jaccard_threshold
        )
        non_canon = (
            dup_clusters(verified).where(~F.col("is_canonical")).select(
                F.col("doc_id").alias(id_col))
        )
        survivors = batch.join(non_canon, id_col, "left_anti")

        # (2) cross-batch: drop docs colliding with the recent store —
        # every epoch EXCEPT this one, so a crash-replay of this epoch
        # filters against exactly the pre-crash state
        sigs = minhash_signatures(survivors, id_col, col, self.k).localCheckpoint(
            eager=True
        )
        bands_new = band_hashes(sigs, id_col, self.k, self.bands)
        store = self._load(spark, exclude_epoch=int(epoch_id))
        if store is not None and store.head(1):
            hits = (
                bands_new.join(
                    F.broadcast(store.select("band", "bh").distinct()),
                    ["band", "bh"],
                )
                .groupBy(id_col)
                .agg(F.count("*").alias("_nb"))
                .where(F.col("_nb") >= self.min_band_matches)
                .select(id_col)
            )
            survivors = survivors.join(hits, id_col, "left_anti")
            bands_new = bands_new.join(hits, id_col, "left_anti")
        survivors = survivors.localCheckpoint(eager=True)

        # (3) advance the store: this epoch's accepted bands overwrite its
        # OWN partition (idempotent on replay)...
        import os
        import shutil

        fresh = bands_new.join(
            survivors.select(id_col, F.col(ts_col).alias("_ts")), id_col
        ).select("band", "bh", F.col("_ts").alias("ts"))
        fresh.write.mode("overwrite").parquet(
            os.path.join(self.store_dir, f"epoch={int(epoch_id)}")
        )
        # ...then whole epochs whose max event time fell behind the horizon
        # drop as partitions (never rewriting other epochs' data)
        full = self._load(spark)
        if full is not None:
            by_epoch = (
                spark.read.option("basePath", self.store_dir)
                .parquet(*[os.path.join(self.store_dir, f"epoch={e}")
                           for e in self._epochs()])
                .groupBy("epoch")
                .agg(F.max("ts").alias("mx"))
                .collect()
            )
            mx_by_epoch = {r["epoch"]: r["mx"] for r in by_epoch}
            horizon = max((m for m in mx_by_epoch.values() if m is not None),
                          default=None)
            if horizon is not None:
                from datetime import timedelta

                cutoff = horizon - timedelta(seconds=self.watermark_s)
                for e in self._epochs():
                    mx = mx_by_epoch.get(e)
                    # absent/null max ts = an all-dropped (empty) epoch: no
                    # bands to keep, safe to drop alongside expired epochs
                    if mx is None or mx < cutoff:
                        shutil.rmtree(
                            os.path.join(self.store_dir, f"epoch={e}"),
                            ignore_errors=True,
                        )
        return survivors


def run_stream_clean_neardup(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    ts_col: str = "ts",
    col: str = "text",
    watermark_s: int = 3600,
    timeout_s: float = 300.0,
    **store_kw,
) -> None:
    """The full streaming curation with NEAR-dedup: quality gate (pure
    expressions) → per-batch LSH near-dedup against the bounded recent
    store → parquet append. Runs availableNow (drain + return); rerunning
    resumes from the checkpoint. Exact duplicates are a special case of
    the band filter (identical docs collide in ALL bands), so this
    pipeline subsumes ``stream_dedup_exact`` while it runs."""
    store = NearDupStore(store_dir, watermark_s=watermark_s, **store_kw)
    out_cols = stream.columns

    def apply_batch(batch: DataFrame, epoch: int) -> None:
        gated = quality_score(batch, col).where(F.col("quality_ok")).select(out_cols)
        kept = store.filter_batch(gated, epoch_id=epoch, col=col, ts_col=ts_col)
        kept.select(out_cols).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
