from pyspark.sql import functions as F

from dbt_core_gcloud_template_spark.operators import dedup, text_analysis


def model(dbt, session):
    """Daily EXACT-tier ingest: gate the batch (quality floor +
    blocklist), dedup it against the STORED digest index, append the
    survivors.  The stored table's own ``text_hash`` column IS the
    digest index — ``dbt.this`` under ``is_incremental()`` plays the
    role of the stored index in
    :func:`operators.dedup.exact_dedup_incremental`, and the engine's
    append materialization is :func:`append_digest_index` (a pure
    union) made durable.  Per-day cost: one batch groupBy on 32-char
    digests + one anti-join against the index (broadcast while small;
    store this table bucketed by ``text_hash`` at scale and the probe
    join needs no index-side shuffle)."""
    dbt.config(materialized="incremental", incremental_strategy="append")
    batch = dbt.ref("stg_batch")
    floor = float(dbt.config.get("min_quality", 0.5))
    thr = float(dbt.config.get("max_blocklist_ratio", 0.2))
    good = (
        text_analysis.quality_score(batch, "doc_id", "text")
        .filter(F.col("quality_score") >= floor)
        .select("doc_id")
    )
    safe = (
        text_analysis.blocklist_filter(batch, "doc_id", "text", max_hit_ratio=thr)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    gated = batch.join(good, "doc_id").join(safe, "doc_id")
    if dbt.is_incremental():
        # FIRST-ACCEPTED WINS (restatement semantics, r8 verdict #5): a
        # doc_id this table already holds never re-enters, even if a
        # re-delivered day restates it with CHANGED text — the stored
        # corpus is immutable history, and without this guard a
        # restated text would pass the digest probe (new hash) and fork
        # the doc across tiers (the doc_id-keyed signature/flag stages
        # would keep first-version state while docs_kept held both).
        # Genuinely NEW ids inside a re-delivered range still ingest
        # normally (late additions).  Also the retry guard: an
        # unchanged re-run drops here before anything is hashed.  At
        # scale the stored side prunes to the day's id range.
        lo = int(dbt.config.get("day_lo", 0))
        hi = int(dbt.config.get("day_hi", 1_000_000_000))
        gated = gated.join(
            session.table(dbt.this)
            .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .select("doc_id"),
            "doc_id",
            "left_anti",
        )
        index = session.table(dbt.this).select("text_hash")
    else:
        index = gated.selectExpr("md5(text) AS text_hash").filter("1=0")
    # Probe tier is vars-selected: `anti_join` (default) runs the plain
    # index anti-join; `bloom` pre-splits the batch on a bloom bitmap
    # of the index so most digests bypass the join — the 100 TB tier
    # when the index outgrows a broadcast.  Output is bit-identical
    # (no false negatives; positives re-checked exactly), which the
    # replay test pins through the engine.  In production the bitmap
    # is a persisted BloomBitmap artifact refreshed at ingest
    # (operators/bloom.py:update_bloom_bitmap) rather than rebuilt
    # from the index each run as here.
    if str(dbt.config.get("exact_probe", "anti_join")) == "bloom":
        accepted = dedup.exact_dedup_incremental_bloom(
            gated, index, "text", "doc_id", n_bits=1 << 16, k=5
        )
    else:
        accepted = dedup.exact_dedup_incremental(gated, index, "text", "doc_id")
    # n_copies is deliberately NOT stored: it counts copies within the
    # accepting batch only, so it is ingest-cadence-dependent — the
    # replay invariant (day-3 ≡ one-shot) holds for the survivor SET
    # and canonical ids, which is what downstream consumes.
    return accepted.join(
        gated, accepted["canonical_id"] == gated["doc_id"]
    ).select("doc_id", "text_hash", "text", "lang", "source", "n_chars")
