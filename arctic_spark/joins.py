"""Distributed spatial join — filter–refine, Spark-first.

The reference joins two frames through an R-tree: build per-side trees,
bbox candidate pairs, exact predicate per candidate, then a row-index
equi-join (geopolars/src/spatial_index.rs:37-204). That design is
single-node and fully materialized. The Spark-native re-expression keeps
the same filter–refine structure but distributes each phase:

1. **distribute**: each geometry gets the set of fixed-grid cells its
   bbox covers (native `explode` over a native cell-id expression — no
   UDF, no custom partitioner: the cell id IS the shuffle key);
2. **join**: equi-join on cell id — a plain shuffled hash join Catalyst
   plans (AQE skew-join splits hot cells; `broadcast_right=True` short-
   circuits the shuffle for a small dim side);
3. **refine**: exact predicate — Catalyst-native ray-cast for point/
   polygon pairs (the dominant case, fully JVM-side), pandas-UDF general
   kernel otherwise;
4. **dedup-free reporting**: a candidate pair can meet in several cells;
   only the canonical cell (the one containing the min corner of the
   bbox intersection) reports it, so no distinct()/re-shuffle is needed —
   at 100 TB a global dedup shuffle would dominate the join itself.

Defaults mirror SpatialJoinArgs (spatial_index.rs:24-35): inner join,
intersects predicate, ``_left``/``_right`` suffixes on ALL columns.
Matching the reference's refine table (spatial_index.rs:89-137),
point/polygon pairs under BOTH 'intersects' and 'contains' delegate to
polygon-contains-point (boundary-exclusive ray cast).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions import native
from .functions.udfs import contains as _contains_udf
from .functions.udfs import intersects as _intersects_udf
from .geodataframe import GeoDataFrame


def _opaque(col):
    """Optimizer-opaque identity (see functions.native.freeze): stops
    CollapseProject / predicate pushdown from inlining the heavy
    geometry-construction tree into downstream operators (the inferred
    isnotnull null-guard was otherwise pushed to the scan with 16
    inlined copies per row)."""
    return native.freeze(col)


def _cells_for_bounds(xmin, ymin, xmax, ymax, cell_size):
    """array<struct<cx:int,cy:int>> of grid cells covering a bbox —
    pure Catalyst (nested sequence transform + flatten)."""
    cs = F.lit(float(cell_size))
    cx0 = F.floor(xmin / cs).cast("int")
    cx1 = F.floor(xmax / cs).cast("int")
    cy0 = F.floor(ymin / cs).cast("int")
    cy1 = F.floor(ymax / cs).cast("int")
    return F.flatten(F.transform(
        F.sequence(cx0, cx1),
        lambda cx: F.transform(F.sequence(cy0, cy1),
                               lambda cy: F.struct(cx.alias("cx"),
                                                   cy.alias("cy")))))


def _with_cells(df, geom_col, cell_size, prefix, flags=False,
                pad=0.0):
    """Attach per-row join metadata columns (bbox, grid cell) and explode
    one row per covered cell.

    Every derived quantity — bounds, the cell array, and (with
    ``flags=True``) the rect/convex fast-path flags — is computed inside
    ONE ``_let``-bound struct column ``<prefix>meta``. This matters for
    EXPRESSION-BUILT geometry (st.make_polygon over numeric columns, the
    common ingest pattern): Catalyst inlines a computed column into every
    reference, so deriving bbox/cells/flags as separate columns
    re-evaluated the whole construction ~9x per row (measured: the
    diamond-join candidate phase dropped from 6.4 s to 2.7 s at sf0.1
    when the construction was no longer re-inlined). Parquet-scanned
    geometry is unaffected (attribute references are free).

    ``pad`` expands the bbox (dwithin's radius expansion)."""
    g = F.col(geom_col)
    cs = float(cell_size)
    p = F.lit(float(pad))

    def build(gg):
        xmin, ymin, xmax, ymax = native.bounds(gg)
        xmin, ymin = xmin - p, ymin - p
        xmax, ymax = xmax + p, ymax + p
        fields = [xmin.alias("xmin"), ymin.alias("ymin"),
                  xmax.alias("xmax"), ymax.alias("ymax"),
                  _cells_for_bounds(xmin, ymin, xmax, ymax, cs)
                  .alias("cells")]
        if flags:
            fields += [native.is_axis_rect(gg).alias("rect"),
                       native.is_convex(gg).alias("cvx")]
        return F.struct(*fields)

    meta = prefix + "meta"
    # No explicit null-geometry filter: null bounds make the cells array
    # null and explode() drops those rows. The meta column is wrapped in
    # an optimizer-opaque identity (_opaque): constraint-inferred
    # isnotnull predicates on its fields otherwise get pushed below this
    # projection with the whole geometry-construction tree INLINED into
    # the filter (measured 16 copies — the dominant cost for
    # expression-built geometry inputs).
    meta_col = _memo_col(("cells_meta", geom_col, cs, float(pad),
                          bool(flags)),
                         lambda: _opaque(native._let(g, build)))
    out = df.withColumn(meta, meta_col)
    return out.withColumn(prefix + "cell",
                          F.explode(F.col(meta + ".cells")))


_CELL_SIZE_MEMO: dict = {}


def estimate_cell_size(df, geom_col="geometry", sample_fraction=0.01,
                       target=4.0):
    """Pick a grid cell size ≈ target× the mean bbox extent of a sample —
    keeps per-geometry cell fan-out ~O(1) while keeping cells selective.
    One small aggregation job; cache-friendly because it reads only the
    geometry bounds (column-pruned scan).

    Memoized on the plan's semantic hash: repeated joins against the
    same frame (iterative pipelines, the bench's warm pass) skip the
    sampling job entirely — at scale the estimate is a property of the
    DATASET, not of the join invocation. Callers with known geometry
    sizes should pass ``cell_size`` explicitly and skip this."""
    memo_key = None
    try:
        memo_key = (df.semanticHash(), geom_col, sample_fraction, target)
        if memo_key in _CELL_SIZE_MEMO:
            return _CELL_SIZE_MEMO[memo_key]
    except Exception:
        pass
    s = df.select(*[c.alias(n) for c, n in
                    zip(native.bounds(F.col(geom_col)),
                        ("x0", "y0", "x1", "y1"))])
    if sample_fraction < 1.0:
        s = s.sample(fraction=sample_fraction, seed=42)
    agg_cols = [F.avg(F.col("x1") - F.col("x0")).alias("w"),
                F.avg(F.col("y1") - F.col("y0")).alias("h"),
                F.min("x0").alias("xmin"), F.max("x1").alias("xmax"),
                F.min("y0").alias("ymin"), F.max("y1").alias("ymax"),
                F.count("*").alias("n")]
    row = s.agg(*agg_cols).collect()[0]
    if row.n == 0 or row.xmax is None:
        # the sample missed every row (small table × small fraction) —
        # a garbage cell size here mis-grids the whole join, so pay one
        # unsampled pass over the (column-pruned) bounds instead
        row = df.select(*[c.alias(n) for c, n in
                          zip(native.bounds(F.col(geom_col)),
                              ("x0", "y0", "x1", "y1"))]) \
                .agg(*agg_cols).collect()[0]
    if row.n == 0 or row.xmax is None:
        return 1.0
    extent = max(row.xmax - row.xmin, row.ymax - row.ymin, 1e-9)
    mean_dim = max(row.w or 0.0, row.h or 0.0)
    if mean_dim <= 0:
        # points: aim for a grid of ~2048 cells per axis over the extent
        out = extent / 2048.0
    else:
        # target× the mean bbox keeps per-geometry fan-out ~O(1), but the
        # cell must stay small relative to the EXTENT too: a handful of
        # giant cells turns the candidate equi-join into a near cross
        # join (every left row × every right row in the cell). Cap at
        # extent/48 (≥ ~2300 cells) unless the geometries themselves are
        # bigger than that — never go below the mean bbox itself, or
        # per-geometry fan-out explodes instead.
        out = max(min(mean_dim * target, extent / 48.0),
                  mean_dim, extent / 65536.0)
    if memo_key is not None:
        if len(_CELL_SIZE_MEMO) > 256:
            _CELL_SIZE_MEMO.clear()
        _CELL_SIZE_MEMO[memo_key] = out
    return out


# Memoized Column construction (py4j-chatter elimination): a spatial
# join builds several ~700-round-trip expression trees, all
# parameterized ONLY by column NAMES, which are canonical inside
# spatial_join ('geometry_left', '__l_px', ...). Measured: build phase
# 4.0 s → ~0.1 s on repeat joins; the driver bench runs 7+ join queries
# per session.
_memo_col = native.memo_col


def _refine_predicate(lg, rg, predicate, udf_refine=True):
    """Exact-predicate column with native fast paths for point/polygon,
    point/point; general pairs go to the pandas-UDF kernel.

    ``udf_refine=False`` keeps the refine 100% JVM-native: type pairs not
    covered natively evaluate to false — exactly the reference's behavior
    for unhandled pairs (spatial_index.rs:89-137 returns false silently).
    Spark evaluates a Python UDF for every input row of its stage even
    under a `when` branch, so disabling it matters for all-point/polygon
    workloads."""
    return _memo_col(("refine", lg, rg, predicate, bool(udf_refine)),
                     lambda: _refine_predicate_build(lg, rg, predicate,
                                                     udf_refine))


def _refine_predicate_build(lg, rg, predicate, udf_refine):
    lcol, rcol = F.col(lg), F.col(rg)
    if predicate in ("touches", "crosses", "overlaps"):
        # exact DE-9IM kernels (geom/relate.py via the batch UDFs) —
        # no native fast path exists for these, so the refine is the
        # kernel itself (candidates still bbox-pruned upstream)
        from .functions import udfs as _udfs
        kern = getattr(_udfs, predicate)
        return F.coalesce(kern(lcol, rcol), F.lit(False))
    point_l = lcol["gt"] == 0
    point_r = rcol["gt"] == 0
    poly_l = lcol["gt"].isin(3, 6)
    poly_r = rcol["gt"].isin(3, 6)
    pip_lr = native.contains_point(rcol, native.x(lcol), native.y(lcol))
    pip_rl = native.contains_point(lcol, native.x(rcol), native.y(rcol))
    pp_eq = ((native.x(lcol) == native.x(rcol))
             & (native.y(lcol) == native.y(rcol)))
    if udf_refine:
        if predicate == "intersects":
            general = _intersects_udf(lcol, rcol)
        else:
            general = _contains_udf(lcol, rcol)
    else:
        general = F.lit(False)
    return (F.when(point_l & poly_r, pip_lr)
             .when(point_r & poly_l, pip_rl)
             .when(point_l & point_r, pp_eq)
             .otherwise(general))


def spatial_join(left, right, how="inner", predicate="intersects",
                 lsuffix="_left", rsuffix="_right", cell_size=None,
                 broadcast_right=None, udf_refine=True, points_left=False,
                 left_key=None, convex_refine="auto"):
    """Distributed filter–refine spatial join.

    Parameters mirror the reference's SpatialJoinArgs
    (spatial_index.rs:15-35): ``how`` in {'inner','left'} (others raise,
    as :200-203 does), ``predicate`` in {'intersects','contains'},
    suffixes applied to every column of each side
    (spatial_index.rs:164-184).

    ``broadcast_right=True`` forces a broadcast hash join on the cell id;
    ``None`` lets AQE decide from runtime sizes.

    ``left_key`` (left joins only): column name or list of columns that
    uniquely key the left side. With a key, the unmatched-row add-back
    anti-joins on it directly — fully deterministic, NO persist of the
    left table (the scale path: without a key a left join must pin the
    whole id-tagged left side in MEMORY_AND_DISK for the lifetime of
    the result). Persisted intermediates are pinned on the returned
    GeoDataFrame — call ``result.release()`` (arctic_spark.cache) when
    the output has been materialized.

    ``convex_refine`` (r13, VERDICT r12 #1): how convex×convex
    candidate pairs refine.

    * ``"sat"`` — the r6 separating-axis Catalyst expressions.
      Zero-Python, but lambda-HOF trees evaluate OUTSIDE codegen:
      measured 0.2 ms/pair (the engine's single largest per-task
      cost, 349 core-s on the sf0.1 diamond gate).
    * ``"kernel"`` — the vectorized Arrow batch kernel
      (geom/batch.py), exact for every type pair. Stress A/B over
      the identical 12.2M-pair candidate set: SAT 76.6 s vs kernel
      13.9 s (**5.5×**), equal match counts
      (scripts/stress_refine_ab.py). The pandas-UDF stage ships
      EVERY candidate row of the stage through Arrow (Spark hoists
      Python UDFs out of ``when`` branches), so this mode is for
      workloads whose pairs actually are convex polygons — tile/
      rect workloads keep "sat" (their pairs take the pure-codegen
      interval branch, and the kernel stage would tax them with
      boundary traffic for nothing).
    * ``"auto"`` (default) — ``"kernel"`` when ``udf_refine=True``
      (the general kernel already evaluates on every row of the
      stage there, so the interpreted SAT branch was computing
      answers the kernel had already produced — dropping it is
      strictly less work, no new Python node); ``"sat"`` when
      ``udf_refine=False`` (preserves the documented 100%-JVM plan).

    On exact-touch (boundary-tie) pairs the SAT and kernel paths can
    round differently in floating point — both are exact in real
    arithmetic; fixtures/gates are constructed tie-free.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"join type {how!r} not supported (reference "
                         "supports Inner/Left, spatial_index.rs:200-203)")
    if predicate == "within":
        # left-within-right == right-contains-left: run the contains
        # join with the SIDES swapped (so every native fast path — rect
        # interval algebra, convex SAT — applies unchanged), then
        # restore left-first column order. Inner only: a left outer
        # would need the unmatched add-back on the swapped build side.
        if how != "inner":
            raise ValueError("predicate='within' supports how='inner' "
                             "only (use predicate='contains' with the "
                             "frames swapped for outer semantics)")
        lgdf0 = left if isinstance(left, GeoDataFrame) else GeoDataFrame(left)
        sw = spatial_join(right, left, how="inner", predicate="contains",
                          lsuffix=rsuffix, rsuffix=lsuffix,
                          cell_size=cell_size, udf_refine=udf_refine,
                          convex_refine=convex_refine)
        lcols = [c + lsuffix for c in lgdf0.df.columns]
        rcols = [c for c in sw.df.columns if c not in lcols]
        return GeoDataFrame(sw.df.select(*lcols, *rcols),
                            lgdf0.geometry_column + lsuffix, lgdf0.crs)
    if predicate not in ("intersects", "contains", "touches", "crosses",
                         "overlaps"):
        raise ValueError(f"predicate {predicate!r} not supported; use "
                         "'intersects', 'contains', 'within', 'touches', "
                         "'crosses' or 'overlaps'")
    if predicate in ("touches", "crosses", "overlaps"):
        # DE-9IM predicates refine through the exact kernel only — the
        # rect/convex fast paths and the points_left plan encode
        # intersects/contains algebra
        if not udf_refine:
            raise ValueError(f"predicate {predicate!r} needs the exact "
                             "kernel; udf_refine=False unsupported")
        if points_left:
            raise ValueError(f"points_left fast path does not apply to "
                             f"predicate {predicate!r}")

    lgdf = left if isinstance(left, GeoDataFrame) else GeoDataFrame(left)
    rgdf = right if isinstance(right, GeoDataFrame) else GeoDataFrame(right)
    ldf, lgeom = lgdf.df, lgdf.geometry_column
    rdf, rgeom = rgdf.df, rgdf.geometry_column

    if cell_size is None:
        cell_size = max(estimate_cell_size(ldf, lgeom),
                        estimate_cell_size(rdf, rgeom))

    # suffix all columns (reference behavior); tag left rows for the
    # left-join add-back
    ldfs = ldf.select(*[F.col(c).alias(c + lsuffix) for c in ldf.columns])
    rdfs = rdf.select(*[F.col(c).alias(c + rsuffix) for c in rdf.columns])
    lg, rg = lgeom + lsuffix, rgeom + rsuffix

    pinned_left = None
    if how == "left":
        if left_key is not None:
            # user-supplied unique key: deterministic identity, nothing
            # to persist — the 100 TB plan
            keys = [left_key] if isinstance(left_key, str) else list(left_key)
            missing = [k for k in keys if k not in ldf.columns]
            if missing:
                raise ValueError(f"left_key column(s) {missing} not in "
                                 f"left frame {ldf.columns}")
            ldfs = ldfs.withColumn("__l_rowid", F.struct(
                *[F.col(k + lsuffix) for k in keys]))
        else:
            # no key: identity must survive across the matched/unmatched
            # plan branches. monotonically_increasing_id alone is
            # non-deterministic under branch recomputation, so the
            # id-tagged left side is persisted (pinning the ids) — this
            # also works for column types Spark cannot compare (MapType),
            # unlike a value-equality anti-join. The handle is pinned on
            # the result for caller-driven release.
            from pyspark import StorageLevel
            ldfs = (ldfs.withColumn("__l_rowid",
                                    F.monotonically_increasing_id())
                        .persist(StorageLevel.MEMORY_AND_DISK))
            pinned_left = ldfs

    if points_left:
        # a point occupies exactly ONE cell: no explode, no left bbox
        # columns, and no canonical-cell dedup (each candidate pair is
        # produced once by construction) — ~2-3x cheaper distribute
        # phase for the dominant points-in-polygons workload. Coordinates
        # are materialized once (repeated native.x() calls would re-run
        # the accessor expression per use).
        csl = F.lit(float(cell_size))
        lc = (ldfs.withColumn("__l_px", native.x(F.col(lg)))
                  .withColumn("__l_py", native.y(F.col(lg)))
                  .where(F.col("__l_px").isNotNull())
                  .withColumn("__l_cell", F.struct(
                      F.floor(F.col("__l_px") / csl).cast("int").alias("cx"),
                      F.floor(F.col("__l_py") / csl).cast("int").alias("cy"))))
    else:
        lc = _with_cells(ldfs, lg, cell_size, "__l_", flags=True)
    rc = _with_cells(rdfs, rg, cell_size, "__r_", flags=True)
    if broadcast_right:
        rc = F.broadcast(rc)

    joined = lc.join(rc, (lc["__l_cell.cx"] == rc["__r_cell.cx"])
                     & (lc["__l_cell.cy"] == rc["__r_cell.cy"]), "inner")

    cs = F.lit(float(cell_size))
    rx0, ry0 = F.col("__r_meta.xmin"), F.col("__r_meta.ymin")
    rx1, ry1 = F.col("__r_meta.xmax"), F.col("__r_meta.ymax")
    if points_left:
        px_, py_ = F.col("__l_px"), F.col("__l_py")
        bbox_ok = ((px_ >= rx0) & (px_ <= rx1)
                   & (py_ >= ry0) & (py_ <= ry1))
        canonical = F.lit(True)
        helper_cols = ["__l_cell", "__l_px", "__l_py", "__r_cell",
                       "__r_meta"]
    else:
        lx0, ly0 = F.col("__l_meta.xmin"), F.col("__l_meta.ymin")
        lx1, ly1 = F.col("__l_meta.xmax"), F.col("__l_meta.ymax")
        # bbox refine (cheap, native) — mirrors the R-tree candidate stage
        bbox_ok = ((lx0 <= rx1) & (rx0 <= lx1)
                   & (ly0 <= ry1) & (ry0 <= ly1))
        # canonical-cell pair dedup (zero extra shuffle)
        ix = F.greatest(lx0, rx0)
        iy = F.greatest(ly0, ry0)
        canonical = ((F.floor(ix / cs).cast("int") == F.col("__l_cell.cx"))
                     & (F.floor(iy / cs).cast("int") == F.col("__l_cell.cy")))
        helper_cols = ["__l_cell", "__r_cell", "__l_meta", "__r_meta"]
    if points_left:
        # refine directly with the materialized coordinates: rectangle
        # right → two interval tests on the precomputed bbox columns
        # (zero geometry work per pair); other polygons → ray cast;
        # point right → equality
        def _build_pip_refine():
            rcol = F.col(rg)
            pxc, pyc = F.col("__l_px"), F.col("__l_py")
            rect_inside = ((pxc > rx0) & (pxc < rx1)
                           & (pyc > ry0) & (pyc < ry1))
            return (F.when(F.col("__r_meta.rect"), rect_inside)
                    .when(rcol["gt"].isin(3, 6),
                          native.contains_point(rcol, pxc, pyc))
                    .when(rcol["gt"] == 0,
                          (pxc == native.x(rcol))
                          & (pyc == native.y(rcol)))
                    .otherwise(_refine_predicate(lg, rg, predicate,
                                                 udf_refine)))
        refine = _memo_col(("pip", lg, rg, predicate, bool(udf_refine)),
                           _build_pip_refine)
    else:
        # axis-rect × axis-rect pairs are pure interval algebra on the
        # hoisted bbox fields — for 'intersects' the bbox_ok filter
        # already IS the exact closed-interval test; for 'contains' it's
        # interval containment (boundary-inclusive, matching the
        # engine's documented covers-style contains). Zero geometry work,
        # zero Python for rectangle workloads (tiles, extents, bboxes) —
        # combined with udf_refine=False the whole refine stays inside
        # whole-stage codegen.
        if convex_refine not in ("auto", "sat", "kernel"):
            raise ValueError(f"convex_refine {convex_refine!r} not "
                             "supported; use 'auto', 'sat' or 'kernel'")
        cvx_kernel = (convex_refine == "kernel"
                      or (convex_refine == "auto" and udf_refine))

        def _build_poly_refine():
            fast_paths = predicate in ("intersects", "contains")
            both_rect = F.col("__l_meta.rect") & F.col("__r_meta.rect") \
                if fast_paths else F.lit(False)
            if predicate == "intersects":
                rect_ans = F.lit(True)
            else:
                rect_ans = ((lx0 <= rx0) & (rx1 <= lx1)
                            & (ly0 <= ry0) & (ry1 <= ly1))
            # convex×convex pairs (hoisted flags): either the r6
            # native SAT / half-plane expressions (zero Python, but
            # interpreted lambda-HOFs — 0.2 ms/pair) or the Arrow
            # batch kernel (5.5× at stress scale; see the
            # convex_refine docstring). Under udf_refine=True the
            # general kernel is ALREADY evaluated for every stage row
            # (Python UDFs hoist out of `when`), so "kernel" there
            # means simply dropping the redundant SAT branch.
            both_cvx = F.col("__l_meta.cvx") & F.col("__r_meta.cvx") \
                if fast_paths else F.lit(False)
            general = _refine_predicate(lg, rg, predicate, udf_refine)
            if cvx_kernel and udf_refine:
                return (F.when(both_rect, rect_ans).otherwise(general))
            if cvx_kernel:
                from .functions import udfs as _udfs
                kern = _udfs.intersects if predicate == "intersects" \
                    else _udfs.contains
                cvx_ans = F.coalesce(kern(F.col(lg), F.col(rg)),
                                     F.lit(False))
            elif predicate == "intersects":
                cvx_ans = native.convex_intersects(F.col(lg), F.col(rg))
            else:
                cvx_ans = native.convex_contains(F.col(lg), F.col(rg))
            return (F.when(both_rect, rect_ans)
                    .when(both_cvx, cvx_ans)
                    .otherwise(general))
        refine = _memo_col(("poly", lg, rg, predicate, bool(udf_refine),
                            bool(cvx_kernel)),
                           _build_poly_refine)
    matched = (joined.where(bbox_ok & canonical)
               .where(refine)
               .drop(*helper_cols))

    if how == "inner":
        return GeoDataFrame(matched, lg, lgdf.crs)

    # left join: reference delegates to a row-index left join
    # (spatial_index.rs:193-199). The persisted __l_rowid (pinned above)
    # keys an anti-join for the unmatched rows; `matched` is persisted so
    # the spatial join itself executes once, not once per branch.
    from pyspark import StorageLevel

    from .cache import pin
    matched = matched.persist(StorageLevel.MEMORY_AND_DISK)
    # eager: the matched/unmatched branches run concurrently in the
    # final action and would otherwise race the cache and each compute
    # the spatial join (the r8 overlay lesson)
    matched.count()
    lcols = [c for c in ldfs.columns if c != "__l_rowid"]
    unmatched = ldfs.join(matched.select("__l_rowid"),
                          "__l_rowid", "left_anti")
    rcols = [c + rsuffix for c in rdf.columns]
    for c in rdf.columns:
        unmatched = unmatched.withColumn(
            c + rsuffix, F.lit(None).cast(rdf.schema[c].dataType))
    out = matched.select(*lcols, *rcols).unionByName(
        unmatched.select(*lcols, *rcols))
    result = GeoDataFrame(out, lg, lgdf.crs)
    pin(result, matched, pinned_left)
    return result


def sjoin(left, right, how="inner", predicate="intersects", **kw):
    """GeoPandas-style alias for spatial_join."""
    return spatial_join(left, right, how=how, predicate=predicate, **kw)


def dwithin_join(left, right, distance, lsuffix="_left", rsuffix="_right",
                 cell_size=None, broadcast_right=None, points_only=False):
    """All pairs within `distance` (point-optimized): grid cells sized by
    the radius, join on cell, native distance refine. The standard
    bucketed band-join strategy — one shuffle, no crossJoin."""
    lgdf = left if isinstance(left, GeoDataFrame) else GeoDataFrame(left)
    rgdf = right if isinstance(right, GeoDataFrame) else GeoDataFrame(right)
    ldf, lgeom = lgdf.df, lgdf.geometry_column
    rdf, rgeom = rgdf.df, rgdf.geometry_column
    if cell_size is None:
        # cell = d is correct (left bboxes are expanded by d, so any pair
        # within d shares a cell) and measures ~2x faster than cell = 2d:
        # candidate sets shrink faster than the cell fan-out grows
        cell_size = max(float(distance), 1e-9)

    ldfs = ldf.select(*[F.col(c).alias(c + lsuffix) for c in ldf.columns])
    rdfs = rdf.select(*[F.col(c).alias(c + rsuffix) for c in rdf.columns])
    lg, rg = lgeom + lsuffix, rgeom + rsuffix
    cs = float(cell_size)
    d = F.lit(float(distance))

    if points_only:
        # r13 (VERDICT r12 #3/#4 family): single points need none of
        # the general machinery — materialized coordinates replace the
        # meta struct (whose optimizer-opaque freeze barrier keeps the
        # WHOLE candidate stage out of codegen), the right point sits
        # in exactly ONE cell (no explode, and every candidate pair is
        # generated exactly once, so the canonical-cell filter
        # disappears), and the refine compares SQUARED distance (no
        # sqrt per candidate). Same candidates, same matches — the
        # nearest_join layout applied to the radius join.
        dd = float(distance)
        lc = (ldfs.withColumn("__l_px", native.x(F.col(lg)))
                  .withColumn("__l_py", native.y(F.col(lg)))
                  .where(F.col("__l_px").isNotNull()))
        lc = lc.withColumn("__l_cell", F.explode(_cells_for_bounds(
            F.col("__l_px") - dd, F.col("__l_py") - dd,
            F.col("__l_px") + dd, F.col("__l_py") + dd, cs)))
        csl = F.lit(cs)
        rc = (rdfs.withColumn("__r_px", native.x(F.col(rg)))
                  .withColumn("__r_py", native.y(F.col(rg)))
                  .where(F.col("__r_px").isNotNull()))
        rc = rc.withColumn("__r_cell", F.struct(
            F.floor(F.col("__r_px") / csl).cast("int").alias("cx"),
            F.floor(F.col("__r_py") / csl).cast("int").alias("cy")))
        if broadcast_right:
            rc = F.broadcast(rc)
        joined = lc.join(rc, (lc["__l_cell.cx"] == rc["__r_cell.cx"])
                         & (lc["__l_cell.cy"] == rc["__r_cell.cy"]),
                         "inner")
        dx = F.col("__l_px") - F.col("__r_px")
        dy = F.col("__l_py") - F.col("__r_py")
        out = joined.where(dx * dx + dy * dy <= d * d) \
            .drop("__l_cell", "__r_cell", "__l_px", "__l_py",
                  "__r_px", "__r_py")
        return GeoDataFrame(out, lg, lgdf.crs)

    # expand left bboxes by the radius so cell-equality is a superset
    # (the meta-struct formulation of _with_cells keeps expression-built
    # geometry evaluated once per row — see its docstring)
    lc = _with_cells(ldfs, lg, cs, "__l_", pad=float(distance))
    rc = _with_cells(rdfs, rg, cs, "__r_")
    if broadcast_right:
        rc = F.broadcast(rc)

    joined = lc.join(rc, (lc["__l_cell.cx"] == rc["__r_cell.cx"])
                     & (lc["__l_cell.cy"] == rc["__r_cell.cy"]), "inner")
    ix = F.greatest(F.col("__l_meta.xmin"), F.col("__r_meta.xmin"))
    iy = F.greatest(F.col("__l_meta.ymin"), F.col("__r_meta.ymin"))
    canonical = ((F.floor(ix / F.lit(cs)).cast("int") == F.col("__l_cell.cx"))
                 & (F.floor(iy / F.lit(cs)).cast("int") == F.col("__l_cell.cy")))
    lcol, rcol = F.col(lg), F.col(rg)
    both_points = (lcol["gt"] == 0) & (rcol["gt"] == 0)
    helper_cols = ["__l_cell", "__r_cell", "__l_meta", "__r_meta"]
    base = joined.where(canonical)
    # Spark evaluates a Python UDF for every row of its stage even
    # under a `when` branch (see _refine_predicate), so the plan is
    # SPLIT: the point/point rows filter natively, only the general
    # rows pass through the UDF stage — all-point data pays zero
    # Python cost. The candidate join feeds both branches, so it is
    # persisted to execute once (not once per branch).
    from pyspark import StorageLevel
    from .functions.udfs import distance as _distance_udf
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    pinned_base = base
    pts = base.where(both_points).where(
        native.distance_points(lcol, rcol) <= d)
    gen = base.where(~both_points).where(_distance_udf(lcol, rcol) <= d)
    out = pts.unionByName(gen)
    out = out.drop(*helper_cols)
    result = GeoDataFrame(out, lg, lgdf.crs)
    from .cache import pin
    pin(result, pinned_base)
    return result


def nearest_join(left, right, max_distance, k=1, left_key=None,
                 lsuffix="_left", rsuffix="_right", broadcast_right=None):
    """k nearest RIGHT points within ``max_distance`` of each LEFT point
    (both sides point geometries — the GeoPandas ``sjoin_nearest``
    analogue with a mandatory search radius).

    Scale shape: grid cells sized by the radius; each left point's probe
    cell expands by the radius (3×3 neighborhood via the same
    bbox-explode as dwithin_join), candidates equi-join on cell id (ONE
    shuffle), distance refines natively, and a per-left-row window keeps
    the k nearest. The radius is mandatory because an unbounded nearest
    search cannot be grid-pruned — at 100 TB an unbounded k-NN is a
    different algorithm (see arctic_spark.llm.similarity for the
    embedding-space versions).

    ``left_key``: column(s) uniquely keying the left side — the window
    partitions on it. Required (windowing needs a per-row identity that
    survives the explode; synthesizing one would need a persist, see
    spatial_join's left path).

    Ties at equal distance break on the right row's coordinates
    (deterministic output). Left rows with no right point in range are
    absent from the result (inner semantics).
    """
    if left_key is None:
        raise ValueError("nearest_join requires left_key (unique column "
                         "name or list) to identify left rows")
    keys = [left_key] if isinstance(left_key, str) else list(left_key)
    lgdf = left if isinstance(left, GeoDataFrame) else GeoDataFrame(left)
    rgdf = right if isinstance(right, GeoDataFrame) else GeoDataFrame(right)
    ldf, lgeom = lgdf.df, lgdf.geometry_column
    rdf, rgeom = rgdf.df, rgdf.geometry_column
    missing = [c for c in keys if c not in ldf.columns]
    if missing:
        raise ValueError(f"left_key column(s) {missing} not in left frame")
    d = float(max_distance)
    cs = max(d, 1e-9)

    ldfs = ldf.select(*[F.col(c).alias(c + lsuffix) for c in ldf.columns])
    rdfs = rdf.select(*[F.col(c).alias(c + rsuffix) for c in rdf.columns])
    lg, rg = lgeom + lsuffix, rgeom + rsuffix

    lc = (ldfs.withColumn("__l_px", native.x(F.col(lg)))
              .withColumn("__l_py", native.y(F.col(lg)))
              .where(F.col("__l_px").isNotNull()))
    lc = lc.withColumn("__l_cell", F.explode(_cells_for_bounds(
        F.col("__l_px") - d, F.col("__l_py") - d,
        F.col("__l_px") + d, F.col("__l_py") + d, cs)))
    rc = (rdfs.withColumn("__r_px", native.x(F.col(rg)))
              .withColumn("__r_py", native.y(F.col(rg)))
              .where(F.col("__r_px").isNotNull()))
    csl = F.lit(cs)
    rc = rc.withColumn("__r_cell", F.struct(
        F.floor(F.col("__r_px") / csl).cast("int").alias("cx"),
        F.floor(F.col("__r_py") / csl).cast("int").alias("cy")))
    if broadcast_right:
        rc = F.broadcast(rc)
    joined = lc.join(rc, (lc["__l_cell.cx"] == rc["__r_cell.cx"])
                     & (lc["__l_cell.cy"] == rc["__r_cell.cy"]), "inner")
    # right point sits in exactly one cell → each candidate pair appears
    # once; no canonical-cell dedup needed
    dist = F.sqrt((F.col("__l_px") - F.col("__r_px")) ** 2
                  + (F.col("__l_py") - F.col("__r_py")) ** 2)
    cand = joined.where(dist <= F.lit(d)).withColumn("__dist", dist)
    from pyspark.sql import Window
    w = Window.partitionBy(*[F.col(c + lsuffix) for c in keys]) \
              .orderBy(F.col("__dist").asc(), F.col("__r_px").asc(),
                       F.col("__r_py").asc())
    out = (cand.withColumn("__rank", F.row_number().over(w))
           .where(F.col("__rank") <= int(k))
           .drop("__l_cell", "__r_cell", "__l_px", "__l_py",
                 "__r_px", "__r_py", "__rank")
           .withColumnRenamed("__dist", "distance"))
    return GeoDataFrame(out, lg, lgdf.crs)


def sjoin_nearest(left, right, max_distance, **kw):
    """GeoPandas-style alias for nearest_join (radius-bounded)."""
    return nearest_join(left, right, max_distance, **kw)


def overlay(left, right, how="intersection", lsuffix="_1", rsuffix="_2",
            left_key=None, right_key=None, **join_kw):
    """Distributed GeoPandas-style set overlay of two polygonal frames
    (all six GeoPandas ``how`` modes; reference rst:157 names
    clip/overlay as the roadmap surface).

    - ``how='intersection'``: every intersecting (left, right) pair with
      both attribute sets (suffixed) and the pairwise intersection as
      the new ``geometry``; empty/degenerate intersections are dropped.
      Plan: the grid filter–refine spatial join finds candidate pairs
      (one shuffle on the cell key), then the boolean kernel runs
      pair-local — no post-join shuffle.
    - ``how='difference'``: each left row minus the UNION of every
      right polygon it intersects, left attributes only (GeoPandas
      semantics); lefts touching nothing pass through unchanged. Needs
      a unique ``left_key`` (column or list) — the per-left aggregation
      groups on it (one extra shuffle on the key, carrying only the
      matched right geometries).
    - ``how='identity'`` (needs ``left_key``): intersection pieces plus
      the left leftovers — GeoPandas' union restricted to the left
      frame's extent. Right attributes are NULL on leftover rows.
    - ``how='union'`` (needs ``left_key`` AND ``right_key``): identity
      plus the right leftovers.
    - ``how='symmetric_difference'`` (needs both keys): both sides'
      leftovers, no intersection pieces.

    The composite modes are plan-level concatenations
    (``unionByName``) of the two primitives run per side — each input
    is scanned at most twice and every piece keeps the primitives'
    one-shuffle structure, so the composition adds no new shuffle
    stage, only parallel branches. All modes emit the unified
    GeoPandas column layout: left attributes (``lsuffix``), right
    attributes (``rsuffix``), ``geometry``; attributes of the absent
    side are NULL.
    """
    from .functions import udfs as _udfs
    lgdf = left if isinstance(left, GeoDataFrame) else GeoDataFrame(left)
    rgdf = right if isinstance(right, GeoDataFrame) else GeoDataFrame(right)
    gl, gr = lgdf.geometry_column, rgdf.geometry_column

    if how == "intersection":
        sj = spatial_join(lgdf, rgdf, how="inner", predicate="intersects",
                          lsuffix=lsuffix, rsuffix=rsuffix, **join_kw)
        lg, rg = gl + lsuffix, gr + rsuffix
        out = (sj.df
               .withColumn("geometry", _udfs.intersection(F.col(lg),
                                                          F.col(rg)))
               .where(~native.is_empty(F.col("geometry")))
               .where(native.area(F.col("geometry")) > 0)
               .drop(lg, rg))
        return GeoDataFrame(out, geometry_column="geometry", crs=lgdf.crs)

    if how == "difference":
        if left_key is None:
            raise ValueError("overlay(how='difference') needs left_key "
                             "(unique column(s) on the left frame)")
        keys = [left_key] if isinstance(left_key, str) else list(left_key)
        sj = spatial_join(lgdf, rgdf, how="inner", predicate="intersects",
                          lsuffix=lsuffix, rsuffix=rsuffix, **join_kw)
        rg = gr + rsuffix
        hit_union = (sj.df
                     .groupBy(*[F.col(k + lsuffix).alias(k) for k in keys])
                     .agg(_udfs.union_collected(
                         F.collect_list(F.col(rg))).alias("__r_union")))
        out = (lgdf.df.join(hit_union, on=keys, how="left")
               .withColumn(gl, F.when(
                   F.col("__r_union").isNull(), F.col(gl))
                   .otherwise(_udfs.difference(F.col(gl),
                                               F.col("__r_union"))))
               .drop("__r_union")
               .where(~native.is_empty(F.col(gl))))
        return GeoDataFrame(out, geometry_column=gl, crs=lgdf.crs)

    if how in ("union", "identity", "symmetric_difference"):
        if left_key is None:
            raise ValueError(f"overlay(how={how!r}) needs left_key "
                             "(unique column(s) on the left frame)")
        if how != "identity" and right_key is None:
            raise ValueError(f"overlay(how={how!r}) needs right_key "
                             "(unique column(s) on the right frame)")
        from pyspark import StorageLevel
        from .cache import pin
        from .functions import udfs as _udfs
        # ONE spatial join feeds every branch (the intersection pieces
        # AND both sides' leftover aggregations group over the same
        # pair list) — composing the primitives naively would run the
        # identical join up to three times
        sj = spatial_join(lgdf, rgdf, how="inner",
                          predicate="intersects",
                          lsuffix=lsuffix, rsuffix=rsuffix, **join_kw)
        lg, rg = gl + lsuffix, gr + rsuffix
        # Per-pair intersection computed ONCE inside the persisted
        # frame (r9, VERDICT r8 task #4): the intersection branch emits
        # it directly, and BOTH leftover aggregations union the clipped
        # pieces instead of the full opposite polygons — identity
        # l − ∪rᵢ = l − ∪(l∩rᵢ) (and symmetrically for the right side),
        # so the general boolean kernel sees one intersection per pair
        # total plus unions over already-clipped (much smaller) inputs,
        # instead of re-running intersection in one branch and
        # full-polygon union+difference in two more.
        sjdf = (sj.df
                .withColumn("__piece",
                            _udfs.intersection(F.col(lg), F.col(rg)))
                .persist(StorageLevel.MEMORY_AND_DISK))
        # materialize NOW: the composed plan unions three branches that
        # all read sjdf, and a lazy persist lets their concurrent tasks
        # each recompute the join before the cache fills (measured 3x
        # the join cost at r8) — one bounded action pins it first
        sjdf.count()
        parts = []
        if how != "symmetric_difference":
            inter = (sjdf
                     .withColumn("geometry", F.col("__piece"))
                     .where(~native.is_empty(F.col("geometry")))
                     .where(native.area(F.col("geometry")) > 0)
                     .drop(lg, rg, "__piece"))
            parts.append(inter)

        def leftover(df0, geom, keys, suf):
            keys = [keys] if isinstance(keys, str) else list(keys)
            # fused kernel: subject − union(pieces) is ONE arrangement
            # pass (difference_collected) right after the collect_list
            # agg — the subject rides the agg as first() (functionally
            # dependent on the key), so no dissolved-union geometry is
            # serialized through the join and the whole leftover costs
            # one Arrow stage instead of two
            hit = (sjdf.groupBy(*[F.col(k + suf).alias(k)
                                  for k in keys])
                   .agg(F.first(F.col(geom + suf)).alias("__subj"),
                        F.collect_list(F.col("__piece")).alias("__ps"))
                   .select(*keys, F.lit(True).alias("__hit"),
                           _udfs.difference_collected(
                               F.col("__subj"), F.col("__ps"))
                           .alias("__leftover")))
            out = (df0.join(hit, on=keys, how="left")
                   .withColumn(geom, F.when(F.col("__hit").isNull(),
                                            F.col(geom))
                       .otherwise(F.col("__leftover")))
                   .drop("__leftover", "__hit")
                   .where(~native.is_empty(F.col(geom))))
            return out.select(
                *[F.col(c).alias(c + suf)
                  for c in df0.columns if c != geom],
                F.col(geom).alias("geometry"))

        parts.append(leftover(lgdf.df, gl, left_key, lsuffix))
        if how != "identity":
            parts.append(leftover(rgdf.df, gr, right_key, rsuffix))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        lcols = [c + lsuffix for c in lgdf.df.columns if c != gl]
        rcols = [c + rsuffix for c in rgdf.df.columns if c != gr]
        out = out.select(*lcols, *rcols, "geometry")
        return pin(GeoDataFrame(out, geometry_column="geometry",
                                crs=lgdf.crs), sjdf)

    raise ValueError(f"overlay how={how!r} not supported (use "
                     "'intersection', 'difference', 'union', "
                     "'identity' or 'symmetric_difference')")
