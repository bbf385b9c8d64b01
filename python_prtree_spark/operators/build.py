"""Index build: distributed bulk load (the reference's ctor,
prtree.h:188-259 + build at :470-585, re-expressed Spark-first).

Pipeline: validate → explode covering cells → ONE shuffle on (cell, salt)
with an in-partition sort → a streaming ``mapInArrow`` packs each cell's
rows into an STRPack (one Arrow stream per partition; memory = one batch +
one carried cell, never a whole partition; output rows leave Python as
large multi-cell RecordBatches built zero-copy from numpy) → one index row
per (cell, salt) holding the packed arrays, Morton-sorted for scan locality.
The persisted form (see sources/store.py) is the durable analogue of the
reference's cereal archive (prtree.h:119-143) — but columnar, partitioned,
and partition-prunable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StructField, StructType,
)

from python_prtree_spark.config import DEFAULT_CONFIG, EngineConfig
from python_prtree_spark.functions.geometry import validate_boxes_df
from python_prtree_spark.functions.tiling import (
    explode_cells, morton_encode, morton_sql,
)
from python_prtree_spark.operators.probe import _hot_cells, resolve_geometry
from python_prtree_spark.operators.strpack import STRPack

__all__ = ["build_index", "INDEX_SCHEMA"]

BOX = ["xmin", "ymin", "xmax", "ymax"]

INDEX_SCHEMA = StructType([
    StructField("cell", LongType()),
    StructField("salt", IntegerType()),
    StructField("zorder", LongType()),        # Morton key of the cell — layout
    StructField("n_rows", LongType()),        # lineage metric
    StructField("leaf_size", IntegerType()),
    StructField("ids", ArrayType(LongType())),
    StructField("b_xmin", ArrayType(DoubleType())),
    StructField("b_ymin", ArrayType(DoubleType())),
    StructField("b_xmax", ArrayType(DoubleType())),
    StructField("b_ymax", ArrayType(DoubleType())),
    StructField("leaf_mbbs", ArrayType(DoubleType())),
])


_FLUSH_CELLS = 1 << 10
_FLUSH_ROWS = 1 << 20
# avg rows/group at which the per-group STRPack loop overtakes the global
# composite lexsort (measured crossover ~34; see process() docstring)
_VEC_AVG = 32


def _make_stream_pack_arrow(cfg: EngineConfig, with_salt: bool):
    """Streaming ``mapInArrow`` pack kernel over partitions sorted by
    (cell[, salt]): walks each Arrow batch group by group, builds an
    STRPack per group, and emits index rows in LARGE RecordBatches
    (~_FLUSH_CELLS cells each) assembled directly from numpy via
    ``pa.ListArray.from_arrays`` — no pandas anywhere, no one-row-per-cell
    batches (the prior mapInPandas kernel serialized one Arrow batch PER
    CELL, which dominated build time). Memory per task = one Arrow batch +
    one carried (partial) group + one output buffer."""
    leaf_size, level = cfg.leaf_size, cfg.level
    side = 1 << level

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        acc = {k: [] for k in
               ("cell", "salt", "n", "ids", "bx0", "by0", "bx1", "by1",
                "mbb", "mbb_n")}
        acc_rows = 0
        acc_cells = 0

        def flush():
            nonlocal acc_rows, acc_cells
            cells = np.concatenate(acc["cell"]).astype(np.int64)
            salts = np.concatenate(acc["salt"]).astype(np.int32)
            ns = np.concatenate(acc["n"]).astype(np.int64)
            z = morton_encode(cells // side, cells % side)
            off = np.zeros(len(ns) + 1, np.int64)
            np.cumsum(ns, out=off[1:])
            off32 = pa.array(off, type=pa.int32())
            mbb_ns = np.concatenate(acc["mbb_n"]).astype(np.int64)
            mbb_off = np.zeros(len(mbb_ns) + 1, np.int64)
            np.cumsum(mbb_ns, out=mbb_off[1:])

            def cat(key, dtype):
                return (np.concatenate(acc[key]) if acc[key]
                        else np.empty(0, dtype))

            rb = pa.record_batch(
                [
                    pa.array(cells), pa.array(salts), pa.array(z),
                    pa.array(ns),
                    pa.array(np.full(len(ns), leaf_size, np.int32)),
                    pa.ListArray.from_arrays(off32, pa.array(cat("ids", np.int64))),
                    pa.ListArray.from_arrays(off32, pa.array(cat("bx0", np.float64))),
                    pa.ListArray.from_arrays(off32, pa.array(cat("by0", np.float64))),
                    pa.ListArray.from_arrays(off32, pa.array(cat("bx1", np.float64))),
                    pa.ListArray.from_arrays(off32, pa.array(cat("by1", np.float64))),
                    pa.ListArray.from_arrays(
                        pa.array(mbb_off, type=pa.int32()),
                        pa.array(cat("mbb", np.float64)),
                    ),
                ],
                names=["cell", "salt", "zorder", "n_rows", "leaf_size",
                       "ids", "b_xmin", "b_ymin", "b_xmax", "b_ymax",
                       "leaf_mbbs"],
            )
            for k in acc:
                acc[k].clear()
            acc_rows = 0
            acc_cells = 0
            return rb

        def process(tbl):
            """Pack every cell group in `tbl`. Two kernels, same output
            bit-for-bit (measured A/B in one session, min over repeats):

            * many tiny groups (avg < _VEC_AVG rows) → ONE composite
              lexsort keyed (group, slab, y-center, x-rank) + ONE reduceat
              for all leaf MBBs — identical order to STRPack._str_order
              per cell (same keys, same stable ties). Flat ~0.75 s/M rows
              regardless of group count; the per-group loop pays ~18 us of
              interpreter overhead per cell (131k cells = 2.6 s/M rows).
            * few large groups → per-group STRPack loop: small per-group
              argsorts beat the 4-key global lexsort 3x when interpreter
              overhead is amortized (256 cells: 0.24 s vs 0.76 s per M)."""
            nonlocal acc_rows, acc_cells
            n = tbl.num_rows
            if n == 0:
                return
            cells = tbl.column("cell").to_numpy()
            coords = np.column_stack([tbl.column(c).to_numpy() for c in BOX])
            dids = tbl.column("_did").to_numpy()
            if with_salt:
                salts = tbl.column("salt").to_numpy()
                new = np.flatnonzero((np.diff(cells) != 0) | (np.diff(salts) != 0)) + 1
            else:
                salts = None
                new = np.flatnonzero(np.diff(cells) != 0) + 1
            bounds = np.concatenate([[0], new, [n]]).astype(np.int64)
            sizes = np.diff(bounds)
            n_groups = len(sizes)

            if n >= _VEC_AVG * n_groups:
                for a, b in zip(bounds[:-1], bounds[1:]):
                    pack = STRPack(dids[a:b], coords[a:b], leaf_size)
                    acc["cell"].append(cells[a : a + 1])
                    acc["salt"].append(salts[a : a + 1] if with_salt
                                       else np.zeros(1, np.int32))
                    acc["n"].append(np.array([pack.n], np.int64))
                    acc["ids"].append(pack.ids)
                    acc["bx0"].append(pack.boxes[:, 0])
                    acc["by0"].append(pack.boxes[:, 1])
                    acc["bx1"].append(pack.boxes[:, 2])
                    acc["by1"].append(pack.boxes[:, 3])
                    acc["mbb"].append(pack.leaf_mbbs.ravel())
                    acc["mbb_n"].append(
                        np.array([4 * len(pack.leaf_mbbs)], np.int64))
                acc_rows += n
                acc_cells += n_groups
                return

            gid = np.repeat(np.arange(n_groups), sizes)
            cx = coords[:, 0] + coords[:, 2]
            cy = coords[:, 1] + coords[:, 3]
            # x-rank within group (stable, like argsort(cx, kind='stable'))
            xorder = np.lexsort((cx, gid))
            pos_in_group = np.arange(n) - np.repeat(bounds[:-1], sizes)
            xrank = np.empty(n, np.int64)
            xrank[xorder] = pos_in_group
            # per-group slab geometry (STRPack._str_order arithmetic)
            n_leaves = -(-sizes // leaf_size)
            n_slabs = np.maximum(1, np.ceil(np.sqrt(n_leaves)).astype(np.int64))
            rps = -(-sizes // n_slabs)
            slab = xrank // np.repeat(rps, sizes)
            final = np.lexsort((xrank, cy, slab, gid))
            o_ids = dids[final]
            o_coords = coords[final]
            # leaf MBBs: starts at group_offset + k*leaf_size, one reduceat
            leaf_base = np.repeat(bounds[:-1], n_leaves)
            leaf_cum = np.zeros(n_groups + 1, np.int64)
            np.cumsum(n_leaves, out=leaf_cum[1:])
            leaf_k = np.arange(leaf_cum[-1]) - np.repeat(leaf_cum[:-1], n_leaves)
            leaf_starts = leaf_base + leaf_k * leaf_size
            mins = np.minimum.reduceat(o_coords[:, :2], leaf_starts, axis=0)
            maxs = np.maximum.reduceat(o_coords[:, 2:], leaf_starts, axis=0)
            mbbs = np.hstack([mins, maxs])  # (total_leaves, 4) row-per-leaf

            acc["cell"].append(cells[bounds[:-1]])
            acc["salt"].append(salts[bounds[:-1]] if with_salt
                               else np.zeros(n_groups, np.int32))
            acc["n"].append(sizes)
            acc["ids"].append(o_ids)
            acc["bx0"].append(o_coords[:, 0])
            acc["by0"].append(o_coords[:, 1])
            acc["bx1"].append(o_coords[:, 2])
            acc["by1"].append(o_coords[:, 3])
            acc["mbb"].append(mbbs.ravel())
            acc["mbb_n"].append(n_leaves * 4)
            acc_rows += n
            acc_cells += n_groups

        carry = None
        for rb in batches:
            tbl = pa.Table.from_batches([rb])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
            if tbl.num_rows == 0:
                continue
            cells = tbl.column("cell").to_numpy()
            cut = int(np.searchsorted(cells, cells[-1], side="left"))
            if with_salt:
                salts = tbl.column("salt").to_numpy()
                cut += int(np.searchsorted(salts[cut:], salts[-1], side="left"))
            carry = tbl.slice(cut)
            if cut > 0:
                process(tbl.slice(0, cut))
                if acc_cells >= _FLUSH_CELLS or acc_rows >= _FLUSH_ROWS:
                    yield flush()
        if carry is not None and carry.num_rows:
            process(carry)
        if acc["cell"]:
            yield flush()

    return fn


def _pack_sql(
    cells: DataFrame, cfg: EngineConfig, extra_cols: list[str] | None = None
) -> DataFrame:
    """JVM-only pack kernel: the whole STR layout as Spark SQL higher-order
    functions — groupBy (cell, salt) → collect_list → two ``array_sort``
    over structs whose leading fields are the sort keys ((cx, id), then
    (slab, cy, x-rank)) → leaf MBBs via sequence + slice + aggregate.
    ZERO Python workers. Interleaved same-session A/B vs the Arrow kernel
    (min over 6-8 runs): 8M boxes / 16k cells on local[32] — SQL 1.8 s
    (4.5 M boxes/s) vs Arrow 4.8 s (the JVM→Python Arrow transfer, not
    pack compute, dominates Arrow build cost); 600k boxes — a wash
    (1.5 s vs 1.4 s, SQL's larger plan-compile cost is fixed, not
    per-row). Same single exchange; the shuffle is the partial-aggregated
    collect_list exchange.

    Layout parity: identical (cell, salt) groups, identical id SETS and
    leaf geometry as the Arrow kernel; within-pack row order breaks
    x-center ties by id (the numpy kernel ties on shuffle arrival order —
    both are valid STR layouts; closed-interval AABB refinement makes
    query results layout-independent, reference bounding_box.h:104-123).

    extra_cols: names of carried coordinate columns (nd persisted indexes:
    min2/max2[, min3/max3]) riding through both layout sorts as TRAILING
    struct fields (never compared: the leading (key, _did) prefix is
    already unique) and extracted as aligned ``b_<name>`` arrays, so a
    loaded pack can refine the closed-interval predicate on dims 2..D-1
    row-for-row against its 2D routing arrays."""
    B = cfg.leaf_size
    level = cfg.level
    extra_cols = list(extra_cols or [])

    # every multi-step expression below is ONE F.expr(...) SQL string, not
    # nested Column-lambda builders: the Column API pays one py4j round
    # trip per node and this tree has hundreds of nodes — measured 0.6 s
    # of pure driver-side plan CONSTRUCTION per build_index call (a third
    # of the 600k-box build wall time, and ~3 s across the 8M probe's 5
    # repeats). The parsed plan is expression-for-expression identical.
    ex_struct = "".join(f", CAST({c} AS DOUBLE) AS {c}" for c in extra_cols)
    ex_copy = "".join(f", x.{c} AS {c}" for c in extra_cols)
    g = cells.groupBy("cell", "salt").agg(
        F.expr(
            "collect_list(struct("
            "CAST(_did AS BIGINT) AS _did, "
            "CAST(xmin AS DOUBLE) AS xmin, CAST(ymin AS DOUBLE) AS ymin, "
            "CAST(xmax AS DOUBLE) AS xmax, CAST(ymax AS DOUBLE) AS ymax"
            f"{ex_struct}))"
        ).alias("rows")
    )
    # sort keys are LEADING STRUCT FIELDS under array_sort's natural struct
    # ordering (field-by-field, ascending) — measured ~1.5x faster than an
    # equivalent comparator lambda (interpreted per comparison); _did makes
    # every key tuple unique, so later fields never get compared
    arr1 = F.expr(
        "array_sort(transform(rows, x -> struct("
        "x.xmin + x.xmax AS cx, x._did AS _did, "
        "x.xmin AS xmin, x.ymin AS ymin, x.xmax AS xmax, x.ymax AS ymax"
        f"{ex_copy})))"
    )
    # n_slabs is inlined into rps (CollapseProject would inline the
    # withColumn chain into the same single Project anyway)
    NL = f"CAST(ceil(n / {B}) AS BIGINT)"
    NS = f"greatest(1, CAST(ceil(sqrt({NL})) AS BIGINT))"
    g = g.select(
        "cell", "salt", F.expr("size(rows)").alias("n"), arr1.alias("a1")
    ).selectExpr(
        "cell", "salt", "n", "a1",
        f"{NL} AS n_leaves", f"CAST(ceil(n / {NS}) AS BIGINT) AS rps",
    )
    tagged = F.expr(
        "transform(a1, (x, i) -> struct("
        "CAST(i / rps AS BIGINT) AS slab, "
        "x.ymin + x.ymax AS cy, "
        "i AS xr, x._did AS _did, "
        "x.xmin AS xmin, x.ymin AS ymin, x.xmax AS xmax, x.ymax AS ymax"
        f"{ex_copy}))"
    )
    g = g.withColumn("a2", F.array_sort(tagged)).drop("a1")
    # extract the plain column arrays FIRST, then fold leaf MBBs with
    # array_min/array_max over double-array slices — ~3x smaller
    # expression tree than aggregate() lambdas over struct slices
    # (driver plan-compile 0.6 s vs 1.9 s, and faster execution too)
    g = g.select(
        "cell", "salt", "n", "n_leaves",
        F.expr("transform(a2, x -> x._did)").alias("ids"),
        F.expr("transform(a2, x -> x.xmin)").alias("b_xmin"),
        F.expr("transform(a2, x -> x.ymin)").alias("b_ymin"),
        F.expr("transform(a2, x -> x.xmax)").alias("b_xmax"),
        F.expr("transform(a2, x -> x.ymax)").alias("b_ymax"),
        *[
            F.expr(f"transform(a2, x -> x.{c})").alias(f"b_{c}")
            for c in extra_cols
        ],
    )
    leaf_mbbs = F.expr(
        "flatten(transform(sequence(0, n_leaves - 1), k -> array("
        f"array_min(slice(b_xmin, k * {B} + 1, {B})), "
        f"array_min(slice(b_ymin, k * {B} + 1, {B})), "
        f"array_max(slice(b_xmax, k * {B} + 1, {B})), "
        f"array_max(slice(b_ymax, k * {B} + 1, {B})))))"
    )
    return g.select(
        "cell",
        F.col("salt").cast("int").alias("salt"),
        F.expr(morton_sql("cell", level)).alias("zorder"),
        F.col("n").cast("long").alias("n_rows"),
        F.lit(B).cast("int").alias("leaf_size"),
        "ids", "b_xmin", "b_ymin", "b_xmax", "b_ymax",
        *[f"b_{c}" for c in extra_cols],
        leaf_mbbs.alias("leaf_mbbs"),
    )


def build_index(
    data_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    data_id: str = "id",
    validate: bool = True,
    n_data_hint: int | None = None,
    only_cells: "list[int] | DataFrame | None" = None,
    kernel: str = "sql",
    extra_cols: list[str] | None = None,
) -> tuple[DataFrame, EngineConfig]:
    """→ (index DataFrame with INDEX_SCHEMA, resolved config).

    Validation mirrors the reference ctor (prtree.h:151-185): NaN/Inf,
    min>max, subnormals raise before any shuffle.

    only_cells: incremental-rebuild path — pack ONLY these cells (rows are
    pruned right after the cell explode, before the shuffle), so a
    dirty-cell refresh costs ~|dirty|/|cells| of a full build. Pass a
    single-column ``cell`` DataFrame for large dirty sets (semi-join —
    never materialized on the driver); a small Python list also works.

    n_data_hint must be the EXACT row count or None (same contract as
    batch_query: an underestimate can skip hot-cell salting).

    kernel: 'sql' (default) packs JVM-side via _pack_sql — no Python
    workers, 2.3x faster end-to-end; 'arrow' keeps the streaming
    mapInArrow numpy kernel (useful as a cross-check and for engines
    without higher-order-function support)."""
    if kernel not in ("sql", "arrow"):
        raise ValueError(
            f"kernel must be 'sql' or 'arrow', got {kernel!r}"
        )
    extra_cols = list(extra_cols or [])
    if extra_cols and kernel != "sql":
        raise ValueError("extra_cols (nd persisted indexes) require kernel='sql'")
    slim = data_df.select(data_id, *BOX, *extra_cols)
    if validate:
        validate_boxes_df(slim.select(data_id, *BOX), cfg)
    cfg, n = resolve_geometry(slim, cfg, n_data_hint)
    cells = explode_cells(slim, cfg.extent, cfg.level).select(
        F.col(data_id).alias("_did"), "cell", *BOX, *extra_cols
    )
    if isinstance(only_cells, DataFrame):
        wanted = only_cells.select(F.col(only_cells.columns[0]).alias("cell"))
        cells = cells.join(wanted, on="cell", how="left_semi")
    elif only_cells is not None:
        cells = cells.where(F.col("cell").isin([int(c) for c in only_cells]))
    hot = _hot_cells(cells, cfg, n)
    keys = ["cell"]
    if hot is not None:
        cells = (
            cells.join(F.broadcast(hot), on="cell", how="left")
            .withColumn("salt", F.when(F.col("n_salts").isNull(), F.lit(0))
                        .otherwise(F.pmod(F.xxhash64("_did"), F.col("n_salts")).cast("int")))
            .drop("n_salts")
        )
        keys = ["cell", "salt"]
    if "salt" not in cells.columns:
        cells = cells.withColumn("salt", F.lit(0))
    if kernel == "sql":
        return _pack_sql(
            cells.select("_did", "cell", "salt", *BOX, *extra_cols),
            cfg, extra_cols,
        ), cfg
    with_salt = "salt" in keys
    index = (
        cells.select("_did", "cell", "salt", *BOX)
        .repartition(*[F.col(k) for k in keys])
        .sortWithinPartitions(*keys)
        .mapInArrow(_make_stream_pack_arrow(cfg, with_salt), schema=INDEX_SCHEMA)
    )
    return index, cfg
