"""End-to-end training-data curation pipeline: quality + repetition
filters -> exact dedup -> near dedup -> curated corpus + metrics.

The reference repo retrieves over a pre-cleaned corpus (robust04); a
100 TB web-corpus engine must produce that clean corpus itself. This
module composes the engine's per-doc feature operators
(`textstats.quality_features` / `textstats.repetition_stats`) and dedup
operators (`dedup.exact_dedup` family) into the standard curation DAG,
with every drop COUNTED and landed in the catalog's ``metrics`` table —
the same no-silent-truncation rule the LSH bucket caps follow.

Plan shape (the 100x audit):
* feature stage: the two feature operators CHAIN as narrow maps via
  their ``keep=`` pass-through (no doc_id re-join, no shuffle) and the
  quality/repetition filters fold into the same map stage;
* exact dedup: ONE hash-aggregate (min doc_id per normalized-text md5)
  + a winner semi-join — both partial-aggregated, no skew (md5 keys);
* near dedup: banded MinHash-LSH (or SimHash) candidates with the
  scale-profile bucket cap DEFAULT-ON and its drop volume recorded,
  exact-Jaccard verification joining candidates only, then one
  anti-join dropping the higher doc_id of each verified pair;
* metrics: stage counts come from ONE aggregate over a persisted
  flag-annotated frame plus two counts over persisted survivors — not a
  count() re-scan per stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import decontam, dedup, pii, textstats

# output column names the feature operators introduce — input columns with
# these names are shielded behind a `_pt_` prefix during the feature stage
# and restored afterwards (all narrow renames, no shuffle)
_FEATURE_COLS = {
    "n_chars", "n_words", "mean_word_len", "punct_ratio", "digit_ratio",
    "stopword_ratio", "quality_score", "n_types", "type_token_ratio",
    "top_unigram_frac", "top_bigram_frac", "unigram_entropy",
}


# catalog table holding the curated corpus's PREFILTER_N-wide minhash
# signatures — the near-dedup state appended micro-batches are checked
# against (VERDICT r4 item 4: streaming appends deduped exactly but not
# against near-dups already in the BASE corpus)
NEARDUP_SIG_TABLE = "dedup_signatures"


@dataclass(frozen=True)
class CurateConfig:
    min_quality: float = 0.4        # composite quality_score floor
    min_words: int = 5
    max_words: int = 100_000
    max_top_bigram_frac: float = 0.3  # Gopher-style repetition ceiling
    near: str = "minhash"           # "minhash" | "simhash" | "none"
    jaccard: float = 0.8            # minhash verify threshold
    # banding-signature shape (r6, VERDICT r5 item 1): defaults are the
    # oracle-pinned 8 hashes / 4 bands; the 530k A/B runs 16/4 (4 rows
    # per band) to cut collision probability on Zipf-head shingles —
    # see BENCH.md round-6. Changing these changes WHICH candidate pairs
    # exist (recall), so the pinned defaults stay for the gated entry.
    n_band_hashes: int = dedup.MINHASH_N
    n_bands: int = dedup.LSH_BANDS
    prefilter_max_loss: float = 2e-3  # estimate-prefilter loss bound (the
    # probability a TRUE threshold-Jaccard pair skips exact verification;
    # drives the match-count bar via dedup.prefilter_min_matches)
    simhash_max_hamming: int = 3
    max_bucket: int = dedup.DEFAULT_MAX_BUCKET
    # optional stages (off by default; the oracle-gated curate_pipeline
    # entry pins the default DAG):
    redact_pii: bool = False        # stage 0: replace PII with placeholders
    max_dup_frac: float | None = None  # drop docs above this duplicated-
    dup_span_ngram: int = 10           # substring-span fraction (Lee et al.)
    decontam_ngram: int = 13        # benchmark n-gram width (GPT-3 appx C)


def curate_corpus(spark: SparkSession, docs: DataFrame, catalog,
                  cfg: CurateConfig = CurateConfig(),
                  id_col: str = "doc_id", text_col: str = "text",
                  out_path: str | None = None,
                  bench: DataFrame | None = None,
                  bench_text_col: str = "text",
                  write_state: bool = False) -> tuple[DataFrame, dict]:
    """Run the curation DAG; returns (curated_docs, stats). Curated docs
    keep the input schema (id + text + any other columns); stats counts
    every drop reason and is appended to the catalog ``metrics`` table
    under phase='curate'. With ``out_path`` the curated corpus is also
    written as parquet before intermediate caches are released (without
    it, re-consuming the returned frame recomputes the DAG).

    Optional stages (each counted in stats, each an anti-join over a
    loser frame bounded by the dropped volume, never the corpus):
    ``cfg.redact_pii`` rewrites the text through pii.pii_redact BEFORE
    features (narrow map — fuses into the same scan); ``bench`` drops
    docs sharing any ``cfg.decontam_ngram``-gram with the benchmark set
    (broadcast bench side); ``cfg.max_dup_frac`` drops docs whose
    Lee-et-al duplicated-span fraction exceeds the threshold.

    STAGED SEMANTICS of the dup-span stage (ADVICE r4): dup_span_stats
    runs over the quality-surviving, decontaminated population — NOT the
    raw corpus — so its dup_frac values can differ from running the
    operator standalone (a doc whose only duplicate partner was already
    dropped by an earlier stage is not re-flagged here). This is the
    intended pipeline semantics: each stage filters the survivors of the
    previous one; run dup_span_stats directly on the corpus when you
    want corpus-wide fractions.

    ``write_state=True`` additionally materializes the curated corpus's
    PREFILTER_N-wide minhash signatures as the catalog's
    ``dedup_signatures`` table — the near-dedup state
    ``filter_appended_neardups`` checks later micro-batches against. In
    minhash mode this is a semi-join of the already-persisted signature
    frame (no extra corpus pass); other modes compute it fresh."""
    import os as _os
    import sys as _sys
    import time as _time
    _prof = _os.environ.get("SPARK_GRAFT_CURATE_PROF") == "1"

    def _pt(label: str, df_to_count=None):
        """Profiling-only stage boundary: with SPARK_GRAFT_CURATE_PROF=1,
        force `df_to_count` and print the wall since the previous mark.
        A no-op (no extra actions) otherwise."""
        if not _prof:
            return
        if df_to_count is not None:
            df_to_count.count()
        now = _time.perf_counter()
        _sys.stderr.write(
            f"CURATEPROF {label} {now - _pt.t0:.2f}s\n")
        _pt.t0 = now
    _pt.t0 = _time.perf_counter()

    passthrough = [c for c in docs.columns if c not in (id_col, text_col)]
    shield = {c: f"_pt_{c}" for c in passthrough if c in _FEATURE_COLS}
    # guide §2.5: a small parquet corpus plans into 1-2 splits and every
    # heavy per-row stage of the DAG (features, shingles, the 32-wide
    # signature hashing) then runs nearly serial; no-op at real scale
    from ..functions.partitioning import ensure_min_partitions
    docs = ensure_min_partitions(docs)
    src = docs.withColumnsRenamed(shield) if shield else docs
    pt = [shield.get(c, c) for c in passthrough]

    if cfg.redact_pii:
        # narrow map replacing the text column in place; downstream
        # stages (features, dedup, output) all see redacted text
        src = (pii.pii_redact(src, id_col=id_col, text_col=text_col,
                              keep=tuple(pt))
               .withColumnsRenamed({"redacted": text_col,
                                    "doc_id": id_col}))

    # --- stage 1: chained narrow-map features + filters (zero shuffle) ---
    feats = textstats.repetition_stats(
        textstats.quality_features(src, id_col=id_col, text_col=text_col,
                                   keep=(text_col, *pt)),
        id_col="doc_id", text_col=text_col,
        keep=(text_col, *pt, "quality_score"))
    qual_ok = ((F.col("quality_score") >= cfg.min_quality)
               & (F.col("n_words") >= cfg.min_words)
               & (F.col("n_words") <= cfg.max_words)
               & (F.col("top_bigram_frac") <= cfg.max_top_bigram_frac))
    flagged = feats.select("doc_id", text_col, *pt,
                           qual_ok.alias("_qual_ok")).persist()
    exact_kept = None
    _cached: list[DataFrame] = []
    try:
        kept = flagged.filter(F.col("_qual_ok")).drop("_qual_ok")

        # --- stage 1b (optional): benchmark decontamination + dup-span
        # filter. Loser frames are computed FROM kept (which reads the
        # persisted flagged frame), so the anti-joins cost one small
        # build side each, not a corpus re-scan.
        n_contam = 0
        if bench is not None:
            # r6 (VERDICT r5 item 4 + this round's narrow n_windows):
            # the exploded window frame now has ONE consumer (the hit
            # counts — per-doc totals are a narrow expression), so
            # persisting it is pure overhead; recompute-mode measured
            # faster already at r5 (+8% for persist)
            contam = (decontam.contamination_stats(
                          kept, bench, n=cfg.decontam_ngram,
                          id_col="doc_id", text_col=text_col,
                          bench_text_col=bench_text_col)
                      .filter(F.col("contaminated") == 1)
                      .select("doc_id").persist())
            _cached.append(contam)
            n_contam = contam.count()
            kept = kept.join(contam, "doc_id", "left_anti")
        n_dupspan = 0
        if cfg.max_dup_frac is not None:
            spans = (decontam.dup_span_stats(
                         kept, n=cfg.dup_span_ngram,
                         id_col="doc_id", text_col=text_col,
                         persist=True, cache_registry=_cached)
                     .filter(F.col("dup_frac") > cfg.max_dup_frac)
                     .select("doc_id").persist())
            _cached.append(spans)
            n_dupspan = spans.count()
            kept = kept.join(spans, "doc_id", "left_anti")

        _pt("quality_flagged", flagged)

        # --- stage 2: exact dedup (one agg + winner semi-join) ---
        hashed = kept.withColumn(
            "_th", F.md5(dedup.normalize_text(F.col(text_col))))
        winners = hashed.groupBy("_th").agg(F.min("doc_id").alias("doc_id"))
        exact_kept = (hashed.join(winners, ["_th", "doc_id"], "left_semi")
                      .drop("_th").persist())
        _pt("exact_dedup", exact_kept)

        # --- stage 3: near dedup on the exact-deduped survivors ---
        losers = None
        est_sigs = None
        if cfg.near == "minhash":
            # shingles feeds both signature aggregates + the verify's
            # three consumers — persist the signature frames (n_docs x 9
            # and x 33 ints — what a web-scale pipeline materializes to
            # scratch anyway) and shingles (O(total chars), spills to
            # disk) instead of recomputing the explode subtree per
            # consumer.
            shingles = dedup.char_shingles(
                exact_kept, text_col=text_col).persist()
            # ONE signature aggregate at the wider estimate width: the
            # seed family mh{j}: is shared, so the banding signature is
            # exactly the first MINHASH_N columns of est_sigs (banding
            # needs collision probability, the estimate prefilter needs
            # concentration). The wide frame repays itself when the
            # verify join sees ~the true near-dup volume instead of
            # LSH's false-candidate volume.
            _pt("shingles", shingles)
            est_sigs = dedup.minhash_signatures(
                shingles, n_hashes=dedup.PREFILTER_N).persist()
            _pt("est_sigs_32w", est_sigs)
            _cached.extend([shingles, est_sigs])
            bar = dedup.prefilter_min_matches(
                cfg.jaccard, dedup.PREFILTER_N, cfg.prefilter_max_loss)
            # r6 (VERDICT r5 item 1): banded LSH with the estimate
            # prefilter applied INLINE in the bucket self-join — the
            # collision volume (139.5M pairs at sf1.0, 2,800/doc) no
            # longer transits ANY exchange; only band rows and the
            # prefilter survivors move. Provably the same surviving pair
            # set as the old distinct -> sig_prefilter_pairs composition
            # (same mh components, same integer bar), so the verified
            # pairs, losers and curated output are value-identical.
            cap_report: dict = {}
            pref, bucket_sizes = dedup.minhash_lsh_prefiltered_pairs(
                est_sigs, min_matches=bar,
                n_hashes=cfg.n_band_hashes, bands=cfg.n_bands,
                max_bucket=cfg.max_bucket,
                drop_report=cap_report, cache_registry=_cached)
            dedup.record_drop_report(spark, catalog, cap_report,
                                     "curate_minhash_lsh")
            pref = pref.persist()
            _cached.append(pref)
            # no-silent-truncation: the collision volume (derived from
            # cap-surviving bucket sizes as sum n*(n-1)/2 — never
            # materialized), the calibrated loss bound AND the
            # exact-verified pair count land in the metrics table.
            # `candidates_in` now counts band collisions (pre-distinct);
            # the old distinct-candidate count would itself cost the
            # O(candidates) exchange this change removes.
            n_cand = int(bucket_sizes.agg(F.coalesce(
                F.sum(F.col("bucket_n") * (F.col("bucket_n") - 1)),
                F.lit(0)).alias("c")).collect()[0]["c"] // 2)
            n_pref = pref.count()
            _pt("lsh_prefiltered_pairs", None)
            loss_ppm = int(round(dedup.prefilter_true_pair_loss(
                cfg.jaccard, dedup.PREFILTER_N, bar) * 1e6))
            _pt("prefilter", pref)
            verified = dedup.ngram_jaccard_pairs(
                shingles, pref, threshold=cfg.jaccard).persist()
            _cached.append(verified)
            n_ver = verified.count()
            _pt("exact_verify")
            catalog.write_table(
                spark.createDataFrame(
                    [("curate_minhash_prefilter", "candidates_in", n_cand),
                     ("curate_minhash_prefilter", "candidates_pruned",
                      n_cand - n_pref),
                     ("curate_minhash_prefilter", "min_matches", bar),
                     ("curate_minhash_prefilter", "n_components",
                      dedup.PREFILTER_N),
                     ("curate_minhash_prefilter", "true_pair_loss_ppm",
                      loss_ppm),
                     ("curate_minhash_verify", "pairs_verified", n_ver)],
                    "phase string, metric string, value long"),
                "metrics", fingerprint="curate", mode="append")
            losers = verified.select(F.col("doc_b").alias("doc_id")).distinct()
        elif cfg.near == "simhash":
            fps = dedup.simhash(exact_kept, text_col=text_col)
            pairs = dedup.simhash_neardup_with_metrics(
                spark, catalog, fps, phase="curate_simhash",
                max_hamming=cfg.simhash_max_hamming,
                max_bucket=cfg.max_bucket,
                cache_registry=_cached)
            losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        elif cfg.near != "none":
            raise ValueError(f"unknown near-dedup mode {cfg.near!r}")

        curated = (exact_kept if losers is None
                   else exact_kept.join(losers, "doc_id", "left_anti"))
        unshield = {v: k for k, v in shield.items()}
        curated = curated.withColumnsRenamed(unshield).select(
            F.col("doc_id").alias(id_col), text_col, *passthrough)

        if write_state:
            if est_sigs is not None:   # minhash mode: reuse, no new scan
                state = est_sigs.join(
                    curated.select(F.col(id_col).alias("doc_id")),
                    "doc_id", "left_semi")
            else:
                state = dedup.minhash_signatures(
                    dedup.char_shingles(curated, id_col=id_col,
                                        text_col=text_col),
                    n_hashes=dedup.PREFILTER_N)
            catalog.write_table(state, NEARDUP_SIG_TABLE,
                                fingerprint="curate-base")

        # --- metrics ---
        agg = flagged.agg(
            F.count("*").alias("rows_in"),
            F.sum(F.col("_qual_ok").cast("long")).alias("rows_quality_ok"),
        ).collect()[0]
        n_in = int(agg["rows_in"])
        n_q = int(agg["rows_quality_ok"] or 0)
        n_exact = exact_kept.count()
        if out_path is not None:
            curated.write.mode("overwrite").parquet(out_path)
            n_out = spark.read.parquet(out_path).count()
        else:
            n_out = curated.count()
        stats = {
            "rows_in": n_in,
            "dropped_quality": n_in - n_q,
            "dropped_contaminated": n_contam,
            "dropped_dup_spans": n_dupspan,
            "dropped_exact_dup": (n_q - n_contam - n_dupspan) - n_exact,
            "dropped_near_dup": n_exact - n_out,
            "rows_out": n_out,
        }
        mrows = [("curate", k, int(v)) for k, v in stats.items()]
        catalog.write_table(
            spark.createDataFrame(
                mrows, "phase string, metric string, value long"),
            "metrics", fingerprint="curate", mode="append")
        return curated, stats
    finally:
        flagged.unpersist()
        if exact_kept is not None:
            exact_kept.unpersist()
        for df in _cached:
            df.unpersist()


def filter_appended_neardups(spark: SparkSession, batch: DataFrame, catalog,
                             id_col: str = "doc_id", text_col: str = "text",
                             jaccard: float = 0.8, max_loss: float = 2e-3,
                             max_bucket: int = dedup.DEFAULT_MAX_BUCKET,
                             phase: str = "curate_append",
                             update_state_tag: str | None = None,
                             metrics_tag: str | None = None,
                             _return_sigs: bool = False):
    """Near-dedup an appended micro-batch against the persisted base-corpus
    signature table (VERDICT r4 item 4: the streaming append path deduped
    exactly but a near-duplicate of a BASE doc sailed through).

    Cost is O(batch): the batch's shingles/signatures are computed fresh
    (O(batch chars)), candidates come from an LSH band join against the
    ``dedup_signatures`` table (collision volume, never a base scan), and
    the decision is the loss-calibrated signature estimate
    (dedup.minhash_neardup_vs_base — a true >=`jaccard` pair is missed
    with probability <= `max_loss`; exact re-verification belongs to the
    next full curate_corpus). Within-batch near-dups are caught by the
    same banded LSH + estimate bar over the batch's own signatures
    (higher doc_id drops, matching curate_corpus).

    Returns (kept_batch, stats) — kept_batch comes back PERSISTED and
    already materialized (the intermediate LSH frames are released before
    returning, so an unmaterialized lazy result would re-run the whole
    band-join subtree per downstream action); the caller unpersists when
    done. Stats rows land in the catalog ``metrics`` table under `phase`;
    pass ``metrics_tag`` to make that write idempotent (a Structured
    Streaming replay of the same tag must not double-count the epoch's
    drop metrics). Bucket-cap truncation in the base/within LSH joins is
    counted into the same stats rows (dropped_buckets / dropped_rows) —
    the no-silent-truncation rule. With ``update_state_tag`` the kept
    docs' signatures are APPENDED to the signature table, keyed by the
    tag for idempotence: replaying the same tag skips the whole filter.
    The tag check uses `snapshot_is_live`, so rebuilding the base state
    (curate --write-state) retires every earlier epoch tag rather than
    letting a stale manifest entry swallow a new batch. With
    ``_return_sigs`` (internal; append_pages_batch_curated) returns
    (kept, stats, kept_sigs) with kept_sigs persisted+materialized so the
    caller can commit it after the index append without recomputing
    signatures from raw text."""
    sigs_fp = f"neardup-sigs:{update_state_tag}" if update_state_tag else None
    if sigs_fp is not None and catalog.snapshot_is_live(NEARDUP_SIG_TABLE,
                                                        sigs_fp):
        # state already advanced by this epoch: the batch was fully
        # processed before a crash/retry — report a no-op
        stats = {"batch_in": 0, "dropped_near_base": 0,
                 "dropped_within_batch": 0, "kept": 0, "skipped": True}
        empty = batch.limit(0)
        return (empty, stats, None) if _return_sigs else (empty, stats)

    bsh = dedup.char_shingles(batch, id_col=id_col, text_col=text_col)
    new_sigs = dedup.minhash_signatures(
        bsh, n_hashes=dedup.PREFILTER_N).persist()
    drop_base = drop_within = kept = kept_sigs = None
    cap_report: dict = {}
    _caches: list = []
    try:
        n_in = batch.count()
        base_sigs = catalog.read_table(spark, NEARDUP_SIG_TABLE)
        bar = dedup.prefilter_min_matches(jaccard, dedup.PREFILTER_N,
                                          max_loss)
        vs_base = dedup.minhash_neardup_vs_base(
            new_sigs, base_sigs, threshold=jaccard, max_loss=max_loss,
            min_matches=bar, max_bucket=max_bucket,
            drop_report=cap_report, cache_registry=_caches)
        near_base = vs_base.select(F.col("doc_a").alias("doc_id")).distinct()

        within_report: dict = {}
        # r6: inline-prefiltered kernel shape (same pair set as the old
        # distinct -> sig_prefilter composition — see
        # minhash_lsh_prefiltered_pairs)
        within, _wsizes = dedup.minhash_lsh_prefiltered_pairs(
            new_sigs, min_matches=bar, max_bucket=max_bucket,
            drop_report=within_report, cache_registry=_caches)
        near_within = within.select(F.col("doc_b").alias("doc_id")).distinct()

        drop_base = near_base.persist()
        n_base = drop_base.count()
        # within-batch losers that survive the base filter (a doc dropped
        # for matching base must not ALSO count as a within-batch drop)
        drop_within = (near_within.join(drop_base, "doc_id", "left_anti")
                       .persist())
        n_within = drop_within.count()
        kept = (batch
                .join(drop_base.withColumnRenamed("doc_id", id_col),
                      id_col, "left_anti")
                .join(drop_within.withColumnRenamed("doc_id", id_col),
                      id_col, "left_anti")
                .persist())
        n_kept = kept.count()   # materialize BEFORE the caches release

        stats = {"batch_in": n_in, "dropped_near_base": n_base,
                 "dropped_within_batch": n_within, "kept": n_kept,
                 "dropped_buckets": (
                     int(cap_report.get("dropped_buckets", 0))
                     + int(within_report.get("dropped_buckets", 0))),
                 "dropped_rows": (
                     int(cap_report.get("dropped_rows", 0))
                     + int(within_report.get("dropped_rows", 0)))}
        metrics_fp = (f"{phase}-metrics:{metrics_tag}" if metrics_tag
                      else phase)
        if metrics_tag is None or not catalog.snapshot_is_live(
                "metrics", metrics_fp):
            mrows = [(phase, k, int(v)) for k, v in stats.items()]
            catalog.write_table(
                spark.createDataFrame(
                    mrows, "phase string, metric string, value long"),
                "metrics", fingerprint=metrics_fp, mode="append")

        if sigs_fp is not None or _return_sigs:
            kept_sigs = new_sigs.join(
                kept.select(F.col(id_col).alias("doc_id")),
                "doc_id", "left_semi").persist()
            kept_sigs.count()   # materialize off the cached new_sigs
        if sigs_fp is not None:
            catalog.write_table(kept_sigs, NEARDUP_SIG_TABLE,
                                fingerprint=sigs_fp, mode="append")
        if _return_sigs:
            return kept, stats, kept_sigs
        if kept_sigs is not None:
            kept_sigs.unpersist()
        return kept, stats
    except BaseException:
        for df in (kept, kept_sigs):
            if df is not None:
                df.unpersist()
        raise
    finally:
        new_sigs.unpersist()
        for df in (drop_base, drop_within, *_caches):
            if df is not None:
                df.unpersist()


def append_pages_batch_curated(spark: SparkSession, batch: DataFrame,
                               catalog, index_cfg, epoch_tag: str,
                               jaccard: float = 0.8,
                               max_loss: float = 2e-3) -> dict:
    """Curated incremental append: near-dedup the micro-batch against the
    base-corpus signature state, index-append only the survivors, then
    advance the signature state — every step keyed by `epoch_tag` so a
    replay at ANY crash point converges (exactly-once end to end):

    1. filter (pure compute, no state written);
    2. index append — the existing two-phase epoch protocol, a no-op on
       replay of an applied epoch;
    3. signature append under fingerprint ``neardup-sigs:{tag}`` —
       skipped when the fingerprint is already in the manifest.

    Step 3 follows step 2, so `sigs done and index not done` is
    unreachable; a crash between 2 and 3 replays as: filter recomputes
    the same kept set against the UNCHANGED state, the index append
    skips itself, and the signature append completes. The filter's drop
    metrics are keyed by the epoch tag too, so a replay never
    double-counts them. The page key is `url` (the index's external
    docid)."""
    from ..streaming.incremental import append_pages_batch, epoch_applied
    sigs_fp = f"neardup-sigs:{epoch_tag}"
    sigs_done = catalog.snapshot_is_live(NEARDUP_SIG_TABLE, sigs_fp)
    if sigs_done and epoch_applied(catalog, epoch_tag):
        return {"appended_docs": 0, "base_docid": -1, "skipped": True}
    kept, stats, kept_sigs = filter_appended_neardups(
        spark, batch, catalog, id_col="url", text_col="text",
        jaccard=jaccard, max_loss=max_loss, update_state_tag=None,
        metrics_tag=epoch_tag, _return_sigs=True)
    try:
        info = append_pages_batch(spark, kept, catalog, index_cfg,
                                  epoch_tag=epoch_tag)
        if not sigs_done:
            catalog.write_table(kept_sigs, NEARDUP_SIG_TABLE,
                                fingerprint=sigs_fp, mode="append")
    finally:
        for df in (kept, kept_sigs):
            if df is not None:
                df.unpersist()
    return {**info, **{f"curate_{k}": v for k, v in stats.items()}}
