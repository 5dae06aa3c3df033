"""Warehouse layout: partitioned + bucketed tables, stats for the CBO.

The reference pre-joins its star into one gold CSV so the dashboard never
joins at query time (etl.ipynb:210 — its one real optimization). At 100 TB
the same idea splits into three storage-level decisions, all encoded here:

- **partition columns** for coarse pruning (a dashboard's quarter/date
  filter should skip files, not read-and-drop rows);
- **bucketing on the join key** so repeated fact<->dim or fact<->fact
  joins are co-located: both sides hash-partitioned identically at WRITE
  time, so the join plans with zero Exchange — the shuffle is paid once,
  not per query (verified by tests/test_warehouse.py on the plan);
- **column statistics** (ANALYZE TABLE) so the cost-based optimizer can
  reorder star joins and pick broadcast sides from real row counts.

Bucketing metadata lives in the session catalog (saveAsTable); on a real
cluster back it with a shared metastore so every session sees the layout.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _drop_stale(spark: SparkSession, table: str) -> None:
    """DROP the catalog entry AND any orphaned location. A managed-table
    location can outlive its catalog entry when a previous session (with
    its own in-memory catalog) wrote it; saveAsTable then fails with
    LOCATION_ALREADY_EXISTS even in overwrite mode."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh_dir = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh_dir}/{table}", ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) parquet table. Sorting
    within buckets lets sort-merge joins skip their sort stage too."""
    _drop_stale(df.sparkSession, table)
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, bucket_col
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_partitioned(
    df: DataFrame, table: str, partition_cols: list[str]
) -> None:
    """Persist partitioned by low-cardinality filter columns (quarter,
    date, event_type ...) for static + dynamic partition pruning."""
    _drop_stale(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet").partitionBy(
        *partition_cols
    ).saveAsTable(table)


def upsert_overwrite(
    spark: SparkSession, table: str, updates: DataFrame, key: str
) -> None:
    """SCD-1 refresh on plain parquet tables: new rows inserted, matched
    keys replaced (last-write-wins), everything else carried forward —
    MERGE semantics without a transactional format.

    Implementation: anti-join current state against the update keys, union
    the updates, rewrite. The rewrite is atomic at the catalog level via
    an intermediate table swap (write to ``<table>__staged``, then swap
    names), so a failed job never leaves a half-written target; a real
    deployment upgrades this to Delta/Iceberg MERGE, which this function
    signature maps onto 1:1.

    Scale: cost is one anti-join + full rewrite — right for dimension
    tables and small-to-medium golds; for fact-scale upserts partition the
    table and rewrite only partitions containing update keys (dynamic
    partition overwrite).
    """
    current = spark.table(table)
    keys = updates.select(key).distinct()
    merged = current.join(keys, key, "left_anti").unionByName(updates)
    staged = f"{table}__staged"
    _drop_stale(spark, staged)
    merged.write.mode("overwrite").format("parquet").saveAsTable(staged)
    _drop_stale(spark, table)
    # Rename via CTAS-free catalog swap: parquet tables support ALTER
    # RENAME in the session catalog.
    spark.sql(f"ALTER TABLE {staged} RENAME TO {table}")


def upsert_partition_overwrite(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    key: str,
    partition_col: str,
) -> None:
    """Fact-scale SCD-1 MERGE on a PARTITIONED parquet table: rewrite only
    the partitions that contain update keys, via dynamic partition
    overwrite — the upgrade path the full-rewrite ``upsert_overwrite``
    docstring promises.

    Mechanics:
    1. touched = partitions named by the updates UNION partitions where
       the updated keys CURRENTLY live (a column-pruned (key, partition)
       scan — so an update that MOVES a key across partitions rewrites
       both its old and new partition, leaving no stale duplicate);
    2. read ONLY those partitions of the current table (semi-join on the
       partition column -> partition pruning, not a full scan);
    3. anti-join away the updated keys, union the updates;
    4. ``insertInto`` with partitionOverwriteMode=dynamic: Spark replaces
       exactly the partitions present in the written data, leaving every
       untouched partition's files in place (asserted on file mtimes in
       tests/test_warehouse.py).

    The merged frame is localCheckpoint-ed before the write because it
    reads the same table it overwrites (Spark's read-write conflict check
    is lineage-based; the checkpoint truncates lineage and, more to the
    point, the source files being replaced must be fully read before
    deletion). Its size is bounded by the TOUCHED partitions only. A real
    deployment upgrades to Delta/Iceberg MERGE; this maps 1:1.
    """
    current = spark.table(table)
    cols = current.columns
    keys = updates.select(key).distinct()
    moved_from = (
        current.select(key, partition_col)
        .join(F.broadcast(keys), key, "left_semi")
        .select(partition_col)
    )
    # Materialize the touched partition VALUES now (a handful by
    # definition): every later step must see the PRE-write state, and a
    # lazy frame over spark.table(table) would re-read the table after
    # the overwrite below.
    touched_vals = [
        r[0]
        for r in updates.select(partition_col)
        .union(moved_from)
        .distinct()
        .collect()
    ]
    if any(v is None for v in touched_vals):
        # isin() below would silently skip NULL partition rows and the
        # DROP PARTITION DDL cannot name them — refuse loudly (round-2
        # review) rather than half-merge.
        raise ValueError(
            f"NULL {partition_col} partition value in updates/current; "
            "filter NULL partition values out before the merge"
        )
    cur_touched = current.filter(F.col(partition_col).isin(touched_vals))
    merged = (
        cur_touched.join(F.broadcast(keys), key, "left_anti")
        .unionByName(updates.select(*cols))
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # insertInto is positional: project to the table's column order.
        merged.select(*cols).write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Dynamic overwrite only replaces partitions PRESENT in the written
    # data: a touched partition left with zero rows (its only row moved
    # away) would keep its stale files. Drop those explicitly. merged is
    # checkpointed above, so this reads pre-write state.
    written = {r[0] for r in merged.select(partition_col).distinct().collect()}
    emptied = [v for v in touched_vals if v not in written]
    for v in emptied:
        # Escape embedded quotes (matches sampling._sql_str) — a partition
        # value containing ' must not break or inject into the DDL.
        lit = "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) else str(v)
        spark.sql(
            f"ALTER TABLE {table} DROP IF EXISTS PARTITION ({partition_col}={lit})"
        )



def _write_tables(spark: SparkSession, writes) -> None:
    """Run independent table writes CONCURRENTLY (guide section 2.6 —
    overlap independent jobs): each item is (table, thunk) where the
    thunk performs the drop+saveAsTable for its own table. The publish
    lifecycles write 2-3 INDEPENDENT tables (a big codes table plus
    broadcast-sized sidecars); sequentially, each tiny sidecar pays its
    full commit-protocol latency while the cluster idles — from a small
    thread pool the sidecar commits hide inside the codes job's tail.
    Thread-safety: different target tables, and Spark's scheduler is
    explicitly designed for concurrent jobs from driver threads."""
    from concurrent.futures import ThreadPoolExecutor

    if len(writes) <= 1:
        for _, thunk in writes:
            thunk()
        return
    with ThreadPoolExecutor(max_workers=min(3, len(writes))) as pool:
        futures = [pool.submit(thunk) for _, thunk in writes]
        for f in futures:
            f.result()


def write_ivf_layout(emb: DataFrame, table: str, n_cells: int = 16) -> None:
    """Cell-partitioned ANN corpus: the IVF nearest-centroid assignment
    (operators.similarity._assign_cells) becomes the STORAGE partition
    column, making probe-time cell selection partition pruning — a query
    probing nprobe of n_cells cells reads nprobe/n_cells of the corpus
    files, whether the probe set is a static IN-list (static pruning) or
    the output of a centroid-scoring join (dynamic partition pruning).
    tests/test_plan_quality.py asserts both on the actual file counts and
    plan.

    The corpus is repartitioned by cell before the write so each cell
    directory holds one file per occupied cell, not one file per (write
    task x cell) — the small-files failure mode of naive partitioned
    writes at 10^9 vectors.
    """
    from ..operators.similarity import _assign_cells, _vecs

    vecs = _vecs(emb)
    cells = vecs.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    assign = _assign_cells(vecs, cells).repartition("cell")
    write_partitioned(assign, table, ["cell"])


def publish_ivfpq_layout(
    emb: DataFrame, prefix: str, n_cells: int = 16, index=None
) -> None:
    """Persist the IVFPQ index (operators.similarity.build_ivfpq_index)
    as the warehouse layout a 10^9-vector deployment serves from:

    - ``<prefix>_codes``: the inverted file (vec_id, m, code)
      PARTITIONED BY cell — probing becomes partition pruning, and the
      stored rows are 8 codes/vector instead of the fp32 vectors (the
      32x compression is now a 32x smaller TABLE, not just a smaller
      shuffle);
    - ``<prefix>_centroids`` / ``<prefix>_codebooks``: the two
      broadcast-sized sidecars a query needs (probe scoring + ADC LUT).

    Codes are repartitioned by cell before the write (one file per
    occupied cell — the write_ivf_layout small-files discipline). All
    stored columns are ints and array<double>; parquet round-trips both
    exactly, so the stored-path query is bit-identical to the in-memory
    path — the claim wh_ivfpq_publish puts under the oracle hash.

    ``index``: optional pre-built ``(cells, books, inv)`` triple from
    build_ivfpq_index — the bench shared-artifact path (VERDICT r12 ask
    #5): several lifecycle entries publish from the SAME deterministic
    build, so rebuilding it per entry re-proves nothing. The publish
    write, the stored layout, and the serve path are unchanged."""
    from ..operators.similarity import build_ivfpq_index

    cells, books, inv = (
        index if index is not None else build_ivfpq_index(emb, n_cells=n_cells)
    )

    def _w_codes():
        write_partitioned(inv.repartition("cell"), f"{prefix}_codes", ["cell"])

    def _w_cells():
        _drop_stale(emb.sparkSession, f"{prefix}_centroids")
        cells.write.mode("overwrite").format("parquet").saveAsTable(
            f"{prefix}_centroids"
        )

    def _w_books():
        _drop_stale(emb.sparkSession, f"{prefix}_codebooks")
        books.write.mode("overwrite").format("parquet").saveAsTable(
            f"{prefix}_codebooks"
        )

    _write_tables(
        emb.sparkSession,
        [("codes", _w_codes), ("centroids", _w_cells), ("books", _w_books)],
    )


def publish_ivfpq256_layout(
    emb: DataFrame, prefix: str, cells=None, inv=None
) -> None:
    """Persist the PRODUCTION-sized IVF+PQ256 index
    (operators.similarity.build_ivfpq256_inv) as the warehouse layout a
    10^9-vector deployment serves from — the publish_ivfpq_layout
    discipline at the production codebook size:

    - ``<prefix>_codes``: the 256-code inverted file (vec_id, m, code)
      PARTITIONED BY cell (probing = partition pruning; 8 bytes of
      codes per vector vs 256 bytes fp32 — 32x smaller stored table);
    - ``<prefix>_centroids`` / ``<prefix>_books``: the broadcast-sized
      sidecars a query needs. The books are the frozen public constant
      (operators.pq256_book) — persisting them pins the sidecar
      round-trip: a serve must answer from the STORED books, so a
      lossy write or a books/constant drift fails the twin oracle.

    ``cells`` / ``inv``: optional pre-built frames (the shared
    built-once bench artifacts); the writes and the stored layout are
    identical either way."""
    from ..operators.similarity import (
        _vecs,
        build_ivfpq256_inv,
        pq256_books,
        refine_centroids,
    )
    from pyspark.sql import functions as F

    spark = emb.sparkSession
    if cells is None:
        vecs = _vecs(emb)
        seeds = vecs.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("cell"), F.col("v").alias("cv")
        )
        cells = refine_centroids(vecs, seeds).localCheckpoint(eager=True)
    if inv is None:
        inv = build_ivfpq256_inv(emb, cells)
    def _w_codes():
        write_partitioned(inv.repartition("cell"), f"{prefix}_codes", ["cell"])

    def _w_cells():
        _drop_stale(spark, f"{prefix}_centroids")
        cells.write.mode("overwrite").format("parquet").saveAsTable(
            f"{prefix}_centroids"
        )

    def _w_books():
        _drop_stale(spark, f"{prefix}_books")
        pq256_books(spark).write.mode("overwrite").format(
            "parquet"
        ).saveAsTable(f"{prefix}_books")

    _write_tables(
        spark,
        [("codes", _w_codes), ("centroids", _w_cells), ("books", _w_books)],
    )


def append_ivfpq_vectors(new_emb: DataFrame, prefix: str) -> None:
    """INCREMENTAL index maintenance — the freshness path a production
    vector store runs between full retrains: new vectors are assigned
    to the FROZEN coarse quantizer (read back from
    ``<prefix>_centroids``), PQ-encoded against the FROZEN codebooks
    (``<prefix>_codebooks``), and their codes APPENDED into the
    cell-partitioned ``<prefix>_codes`` table — no rebuild, no rewrite
    of existing partitions, queries see the new vectors immediately
    through the same probe/ADC path.

    The checked contract (wh_ivfpq_publish twin discipline, extended):
    publish-on-base + append-new must answer EXACTLY like encoding the
    whole corpus against the same frozen structures in one batch — the
    oracle replays train-on-base / encode-all, so a drift in the frozen
    read-back, the assignment, the encode, or the append layout fails
    the hash. Cell rides the subvector explode (one pass over the new
    batch); codes are repartitioned by cell so each appended partition
    gains ONE file per batch (compact_partitions is the standing
    repair when batches accumulate)."""
    from pyspark.sql import functions as F

    from ..functions import portable as P
    from ..operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
        _assign_cells,
        _vecs,
    )

    spark = new_emb.sparkSession
    cells = spark.table(f"{prefix}_centroids")
    books = spark.table(f"{prefix}_codebooks")
    assign = _assign_cells(_vecs(new_emb), cells)
    sub_e = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("m"),
                    F.slice("v", j * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sv"),
                )
                for j in range(PQ_M)
            ]
        )
    )
    subs_c = assign.select("vec_id", "cell", sub_e.alias("e")).select(
        "vec_id", "cell", F.col("e.m").alias("m"), F.col("e.sv").alias("sv")
    )
    # encode: zero-Exchange broadcast-map argmax (r16; previously a
    # max_by partial aggregation whose exchange carried batch x m
    # subvector rows) — identical tie semantics, identical codes
    from ..operators.similarity import _best_code_sql, _books_row, _pin

    enc = (
        _pin(
            subs_c.crossJoin(F.broadcast(_books_row(books))).withColumn(
                "nsv", F.expr(P.spark_norm_sql("sv"))
            ),
            "nsv",
        )
        .select(
            "vec_id", "cell", "m",
            F.expr(_best_code_sql() + ".code").alias("code"),
        )
    )
    target = f"{prefix}_codes"
    cols = spark.table(target).columns  # align column order for append
    enc.select(*cols).repartition("cell").write.mode("append").format(
        "parquet"
    ).partitionBy("cell").saveAsTable(target)


def publish_opq256_layout(
    emb: DataFrame, prefix: str, rotated=None, codes=None
) -> None:
    """Persist the TRUE-OPQ serving layout (sim_ann_opq256's stack) —
    three tables, every serve-time constant in the STORE:

    - ``<prefix>_rot``: the frozen 64x64 rotation as its (pos, rv)
      row frame — the OPQ half no other published layout carries; a
      query must be rotated by the STORED matrix before encode, so a
      lossy sidecar write of the rotation itself fails the twin
      oracle;
    - ``<prefix>_books``: the rotated-TRAINED frozen books
      (operators.pq256r_book);
    - ``<prefix>_codes``: the 256-code table (vec_id, m, code) of the
      ROTATED corpus — 64-bit codes, 32x smaller than fp32. Full-scan
      ADC layout (no cell partitioning): the compressed scan IS the
      budget, the sim_ann_pq256 posture.

    parquet round-trips ints and array<double> exactly, so serving
    from the read-back tables is bit-identical to the in-memory
    pipeline — the claim wh_opq256_publish puts under the oracle
    hash.

    ``rotated`` / ``codes``: optional pre-built frames (the shared
    built-once bench artifacts — the publish_ivfpq256_layout
    discipline); the writes and the stored layout are identical
    either way. INVARIANT (ADVICE r14): the sidecars written are
    always the repo's frozen constants (rot64_frame / pq256r_books),
    so a caller-supplied ``rotated`` MUST be rotate_corpus(emb,
    rot64_frame) output and ``codes`` MUST be pq256_codes of that
    rotated corpus against pq256r_books — frames built from any other
    rotation or books would publish an internally inconsistent layout.
    Both call sites (the entry and the shared-artifact memo) build
    them exactly that way; pass nothing to let this function build
    them from the constants itself."""
    from ..operators.similarity import (
        _vecs,
        pq256_codes,
        pq256r_books,
        rot64_frame,
        rotate_corpus,
    )

    spark = emb.sparkSession
    rot = rot64_frame(spark)
    books = pq256r_books(spark)
    if rotated is None:
        rotated = rotate_corpus(emb, rot)
    if codes is None:
        codes = pq256_codes(_vecs(rotated), books)
    def _w_rot():
        _drop_stale(spark, f"{prefix}_rot")
        rot.write.mode("overwrite").format("parquet").saveAsTable(
            f"{prefix}_rot"
        )

    def _w_books():
        _drop_stale(spark, f"{prefix}_books")
        books.write.mode("overwrite").format("parquet").saveAsTable(
            f"{prefix}_books"
        )

    def _w_codes():
        _drop_stale(spark, f"{prefix}_codes")
        codes.write.mode("overwrite").format("parquet").saveAsTable(
            f"{prefix}_codes"
        )

    _write_tables(
        spark, [("rot", _w_rot), ("books", _w_books), ("codes", _w_codes)]
    )


def append_ivfpq256_vectors(new_emb: DataFrame, prefix: str) -> None:
    """INCREMENTAL maintenance at the PRODUCTION codebook size — the
    append_ivfpq_vectors freshness path for the 256-code layout, and
    the configuration where appends are CHEAPEST to keep honest: the
    books are a frozen offline constant (operators.pq256_book), so the
    only corpus-trained structure is the coarse quantizer; an append
    needs zero retraining of any kind, just assignment + encode
    against read-back frozen structures.

    New vectors are assigned to the FROZEN coarse quantizer (read back
    from ``<prefix>_centroids``, rounded-cosine / ties -> lowest cell
    — operators.similarity._assign_cells, the exact serve-path
    semantics), encoded against the FROZEN stored books (read back
    from ``<prefix>_books``, the L2 MIPS-identity key
    build_ivfpq256_inv uses: round(<sv,cv> - 0.5<cv,cv>, 6), max_by
    ties -> lowest code), and their codes APPENDED into the
    cell-partitioned ``<prefix>_codes`` table — existing partitions
    untouched, one new file per touched cell, queries see the batch
    immediately through the same probe/ADC path.

    Checked contract (wh_ivfpq256_append): publish-on-base +
    append-new must answer EXACTLY like encoding the whole corpus
    against the same frozen structures in one batch. At 100 TB the
    append is one pass over the new batch only; compact_partitions is
    the standing repair as batches accumulate."""
    from pyspark.sql import functions as F

    from ..functions import portable as P
    from ..operators import pq256_book as B
    from ..operators.similarity import (
        _assign_cells,
        _subvectors,
        _vecs,
    )

    spark = new_emb.sparkSession
    cells = spark.table(f"{prefix}_centroids")
    books = spark.table(f"{prefix}_books")
    assign = _assign_cells(_vecs(new_emb), cells).select("vec_id", "cell")
    booksn = books.withColumn(
        "half_cvn", F.expr("CAST('0.5' AS DOUBLE)") * P.dot("cv", "cv")
    )
    codes = (
        _subvectors(_vecs(new_emb))
        .join(F.broadcast(booksn), "m")
        .select(
            "vec_id",
            "m",
            "code",
            F.round(
                P.dot_fixed("sv", "cv", B.SUBDIM) - F.col("half_cvn"), 6
            ).alias("sub_score"),
        )
        .groupBy("vec_id", "m")
        .agg(F.expr("max_by(code, struct(sub_score, -code))").alias("code"))
    )
    enc = codes.join(assign, "vec_id").select("vec_id", "cell", "m", "code")
    target = f"{prefix}_codes"
    cols = spark.table(target).columns  # align column order for append
    enc.select(*cols).repartition("cell").write.mode("append").format(
        "parquet"
    ).partitionBy("cell").saveAsTable(target)


def compact_partitions(
    spark: SparkSession,
    table: str,
    partition_col: str,
    min_files: int = 2,
) -> list:
    """Small-files compaction — the standing maintenance job of any
    partitioned table fed by incremental writes: each micro-batch/merge
    appends files, and a partition with thousands of tiny files turns
    every scan into a task-scheduling storm (task launch overhead,
    footer reads, poor codec ratios). Rewrite each over-fragmented
    partition (>= ``min_files`` parquet files) down to ONE file via
    dynamic partition overwrite, leaving healthy partitions' files
    untouched on disk.

    Mechanics mirror upsert_partition_overwrite: pick victim partitions
    by file count (a file LISTING, no data read), read ONLY those
    partitions (partition pruning), hash-repartition on the partition
    column (one task per value -> one output file per partition
    directory), localCheckpoint (the write replaces the files being
    read), dynamic-overwrite. Returns the compacted partition values —
    empty when the table is already healthy, so the job is idempotent
    and safe to schedule every cycle. (For multi-GB partitions wanting
    N>1 target files, add a salt column to the repartition key; one
    file per partition is the right default at dashboard-gold sizes.)"""
    import glob
    import os

    wh_dir = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    victims = []
    for d in sorted(glob.glob(f"{wh_dir}/{table}/{partition_col}=*")):
        n = len(glob.glob(os.path.join(d, "*.parquet")))
        if n >= min_files:
            raw = os.path.basename(d).split("=", 1)[1]
            victims.append(raw)
    if not victims:
        return []
    current = spark.table(table)
    # Partition values came from directory names (strings); compare on
    # the column cast to string so numeric partition types match.
    cond = F.col(partition_col).cast("string").isin(victims)
    cols = current.columns
    merged = (
        current.filter(cond)
        .repartition(len(victims), partition_col)
        .localCheckpoint(eager=True)
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.select(*cols).write.mode("overwrite").insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return victims


def analyze(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """Collect table + column stats for the cost-based optimizer."""
    if columns:
        spark.sql(
            f"ANALYZE TABLE {table} COMPUTE STATISTICS FOR COLUMNS "
            + ", ".join(columns)
        )
    else:
        spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS")


def morton_code(
    cols: list[str],
    mins: dict,
    maxs: dict,
    bits: int = 8,
    quantiles: dict | None = None,
):
    """Interleaved (Morton / Z-order) code over 2+ numeric columns. Pure
    bitwise Column expression (shiftleft/and) — whole-stage codegen, no
    UDF. Default bucketizer is LINEAR between each dim's min and max;
    pass ``quantiles`` ({col: sorted interior boundaries}) to bucket by
    RANK instead, so a skewed dim still spreads its mass evenly across
    the 2^bits cells (the write_zorder_layout(quantile_buckets=True)
    path). Quantile assignment counts boundaries <= value with one
    higher-order filter over a literal boundary array — interpreted, but
    this runs once inside a layout JOB, not on a query path. Built from
    Column objects (F.array of F.lit), never SQL-text interpolation, so
    NaN boundaries or backtick-needing column names cannot break the
    plan at parse time.

    NULL dim values land in bucket 0 on BOTH bucketizer paths (without
    the explicit guard the linear path's F.least skips the NULL floor()
    and yields the TOP bucket while the quantile path's F.filter drops
    every boundary on a NULL predicate and yields 0 — NULL rows would
    cluster at opposite ends of the Z-curve depending on
    quantile_buckets)."""
    nb = (1 << bits) - 1
    bucketed = []
    for c in cols:
        if quantiles and c in quantiles:
            arr = F.array(*[F.lit(float(x)) for x in quantiles[c]])
            col = F.col(c)
            b = F.size(F.filter(arr, lambda x: x <= col)).cast("long")
            b = F.least(b, F.lit(nb).cast("long"))
        else:
            lo, hi = mins[c], maxs[c]
            span = (hi - lo) or 1
            b = F.least(
                F.floor((F.col(c) - F.lit(lo)) * nb / F.lit(span)),
                F.lit(nb),
            ).cast("long")
        bucketed.append(
            F.when(F.col(c).isNull(), F.lit(0).cast("long")).otherwise(b)
        )
    code = F.lit(0).cast("long")
    for bit in range(bits):
        for d, b in enumerate(bucketed):
            code = code.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, bit).bitwiseAND(F.lit(1)),
                    bit * len(bucketed) + d,
                )
            )
    return code


def write_zorder_layout(
    df: DataFrame,
    path: str,
    dims: list[str],
    n_files: int = 16,
    bits: int = 8,
    quantile_buckets: bool = False,
) -> None:
    """Multi-dimensional data-skipping layout (the OPTIMIZE ZORDER
    primitive of lakehouse tables): rows are range-partitioned and
    sorted by their Morton code, so every output file covers a small
    HYPERCUBE of the dim space instead of a thin slab of one dimension.
    A linear sort on dim A gives perfect pruning on A and NONE on B;
    Z-order gives ~sqrt pruning on BOTH — parquet min/max row-group
    stats and file-level skipping then work for every dim in ``dims``.
    tests/test_warehouse.py proves the per-file span contraction and the
    file-count reduction for a filtered scan against a linear layout.

    Min/max per dim come from one tiny aggregate (driver round-trip at
    write time — a layout JOB, not a query path).
    ``quantile_buckets=True`` bucketizes each dim by approx-quantile
    boundaries instead of linearly — on skewed dims, linear buckets
    dump most rows into a few cells and the Z-curve degenerates to a
    one-dimensional sort; rank bucketing keeps every cell's row count
    ~equal regardless of the value distribution."""
    qs = None
    if quantile_buckets:
        probs = [i / (1 << bits) for i in range(1, 1 << bits)]
        # ONE multi-column approxQuantile pass — the per-column form
        # would rescan the input once per dimension.
        qlists = df.approxQuantile(dims, probs, 0.001)
        qs = dict(zip(dims, qlists))
        mins = maxs = {}
    else:
        stats = df.agg(
            *[F.min(c).alias(f"mn_{c}") for c in dims],
            *[F.max(c).alias(f"mx_{c}") for c in dims],
        ).collect()[0]
        mins = {c: stats[f"mn_{c}"] for c in dims}
        maxs = {c: stats[f"mx_{c}"] for c in dims}
    z = df.withColumn("_z", morton_code(dims, mins, maxs, bits, quantiles=qs))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Versioned snapshots (time travel)
# ---------------------------------------------------------------------------


def _snap_name(table: str, version: int) -> str:
    return f"{table}__v{version}"


def write_snapshot(df: DataFrame, table: str, version: int) -> None:
    """Persist ``df`` as immutable version ``version`` of ``table``.

    Each version is its own parquet table in the catalog — copy-on-write
    at snapshot granularity, the storage contract behind time travel:
    committing version N never touches the files of version N-1, so
    historical reads stay consistent while new versions land. A real
    lakehouse (Delta/Iceberg) tracks versions as file-level manifests
    instead of full copies; this maps 1:1 onto that API
    (``VERSION AS OF``) while staying plain parquet."""
    _drop_stale(df.sparkSession, _snap_name(table, version))
    df.write.mode("overwrite").format("parquet").saveAsTable(
        _snap_name(table, version)
    )


def read_snapshot(
    spark: SparkSession, table: str, version: int
) -> DataFrame:
    """``SELECT * FROM table VERSION AS OF version`` — reads are plain
    scans of the immutable per-version table, so historical queries get
    full pushdown/pruning like any other read."""
    return spark.table(_snap_name(table, version))


def commit_snapshot(
    spark: SparkSession,
    table: str,
    version: int,
    key: str,
    upserts: DataFrame | None = None,
    delete_keys: DataFrame | None = None,
) -> None:
    """Create version N from version N-1 + a change set (upserts by
    ``key``, deletes by key list) — MERGE + time travel in one step.
    Old versions remain readable after the commit (pinned in
    tests/test_warehouse.py and the wh_time_travel oracle, which audits
    ALL versions after the last commit)."""
    state = read_snapshot(spark, table, version - 1)
    if upserts is not None:
        keys = upserts.select(key).distinct()
        state = state.join(F.broadcast(keys), key, "left_anti").unionByName(
            upserts.select(*state.columns)
        )
    if delete_keys is not None:
        state = state.join(
            F.broadcast(delete_keys.select(key).distinct()), key, "left_anti"
        )
    write_snapshot(state, table, version)


def list_snapshots(spark: SparkSession, table: str) -> list[int]:
    """Versions of ``table`` present in the catalog, ascending."""
    prefix = f"{table}__v"
    return sorted(
        int(t.name[len(prefix):])
        for t in spark.catalog.listTables()
        if t.name.startswith(prefix) and t.name[len(prefix):].isdigit()
    )


def vacuum_snapshots(
    spark: SparkSession, table: str, keep_last: int = 2
) -> list[int]:
    """Retention: drop every version except the newest ``keep_last``
    (catalog entry AND files), returning the versions removed — the
    VACUUM half of the time-travel contract: history is readable until
    retention reclaims it, and reclamation is explicit, ordered, and
    observable (the wh_vacuum_retention audit query puts it under the
    correctness gate)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (refusing to drop HEAD)")
    versions = list_snapshots(spark, table)
    removed = versions[:-keep_last]
    for v in removed:
        _drop_stale(spark, _snap_name(table, v))
    return removed


def drop_snapshots(spark: SparkSession, table: str) -> None:
    """Remove ALL versions of ``table`` (test/reset path; production
    retention goes through vacuum_snapshots, which refuses to drop
    HEAD)."""
    for v in list_snapshots(spark, table):
        _drop_stale(spark, _snap_name(table, v))
