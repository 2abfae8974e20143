"""Geospatial operators: grid-bucketed radius join.

The testdata carries no coordinates, so points derive from event keys
by pure integer arithmetic (deterministic, uniform over the globe) —
the OPERATOR under test is the join strategy, not the data: a radius
join done right is a grid-cell equi-join (each point joins its 3×3
cell neighborhood) + an exact distance verify inside the candidates,
never an all-pairs distance pass. That is exactly the MinHash/LSH
candidate-generator shape (llm/dedup.py) applied to 2-D space — the
same bucketed-join playbook engines ship as "ST_DWithin with a
spatial index".

Exactness: coordinates live in INTEGER centidegrees end-to-end
(scaled by 100), cells are non-negative integer divisions, and the
squared distance compare (d² ≤ r²) is integer arithmetic — no trig,
no floats, nothing to drift cross-engine. (A production haversine
verify swaps into the same candidate frame; planar distance keeps the
declared query hash-exact.)

100 TB story: the neighborhood explode is a constant ×9 on one side;
the join shuffles on the cell key whose occupancy bounds pairwise
work (the spatial analogue of LSH bucket occupancy); skewed cells
(cities) are the documented salting candidate, same as hot GROUP
keys.

Reference parity: none — beyond-reference surface.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_rc_spark.registry import register
from flink_rc_spark.sources.tables import load

# integer centidegree coordinates derived from event keys:
# lat ∈ [0, 18000) (shifted −90°..+90°), lon ∈ [0, 36000)
_LAT = "(user_id * 37 + event_id * 17) % 18000"
_LON = "(user_id * 53 + event_id * 29) % 36000"
_R_CD = 100          # radius: 1.00 degree = 100 centidegrees
_CELL = 100          # cell size = radius → 3×3 neighborhood suffices


@register(
    "q_geo_radius_join",
    oracle=f"""
        WITH pts AS (
            SELECT event_id AS id,
                   CAST({_LAT} AS BIGINT) AS lat,
                   CAST({_LON} AS BIGINT) AS lon
            FROM events
        ),
        cells AS (
            SELECT id, lat, lon,
                   lat // {_CELL} AS cl, lon // {_CELL} AS co
            FROM pts
        ),
        probe AS (
            SELECT c.id, c.lat, c.lon,
                   c.cl + dla AS ncl, c.co + dlo AS nco
            FROM cells c,
                 (SELECT CAST(a AS BIGINT) - 1 AS dla FROM range(3) r(a)),
                 (SELECT CAST(o AS BIGINT) - 1 AS dlo FROM range(3) s(o))
        )
        SELECT a.id AS id_a, b.id AS id_b,
               CAST((a.lat - b.lat) * (a.lat - b.lat)
                    + (a.lon - b.lon) * (a.lon - b.lon) AS BIGINT) AS d2
        FROM probe a
        JOIN cells b ON b.cl = a.ncl AND b.co = a.nco AND a.id < b.id
        WHERE (a.lat - b.lat) * (a.lat - b.lat)
              + (a.lon - b.lon) * (a.lon - b.lon) <= {_R_CD * _R_CD}
        ORDER BY d2, id_a, id_b
        LIMIT 20
    """,
    tags=("geo", "join"),
)
def q_geo_radius_join(spark, sf_dir):
    """Radius join ("all point pairs within 1°"): top-20 closest
    pairs via grid-cell candidate generation — each point probes its
    3×3 cell neighborhood (cell size = radius, so no qualifying pair
    can escape the neighborhood: correctness by construction, not
    sampling), then the exact integer d² ≤ r² verify filters
    candidates. Each qualifying pair is generated EXACTLY once (the
    probe offset that matches is unique), so no distinct pass."""
    pts = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"),
        F.expr(_LAT).cast("bigint").alias("lat"),
        F.expr(_LON).cast("bigint").alias("lon"),
    )
    cells = pts.withColumn(
        "cl", (F.col("lat") / _CELL).cast("bigint")
    ).withColumn("co", (F.col("lon") / _CELL).cast("bigint"))
    offsets = F.expr(
        "flatten(transform(sequence(-1, 1), a ->"
        " transform(sequence(-1, 1), o -> struct(a AS dla, o AS dlo))))"
    )
    probe = cells.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        "cl",
        "co",
        F.explode(offsets).alias("d"),
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.col("cl") + F.col("d.dla")).alias("ncl"),
        (F.col("co") + F.col("d.dlo")).alias("nco"),
    )
    b = cells.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cl").alias("bcl"),
        F.col("co").alias("bco"),
    )
    d2 = (F.col("lat_a") - F.col("lat_b")) * (
        F.col("lat_a") - F.col("lat_b")
    ) + (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
    return (
        probe.join(
            b,
            (F.col("ncl") == F.col("bcl"))
            & (F.col("nco") == F.col("bco"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", d2.cast("bigint").alias("d2"))
        .filter(F.col("d2") <= _R_CD * _R_CD)
        .orderBy("d2", "id_a", "id_b")
        .limit(20)
    )


# supplier coordinates (integer centidegrees) derived from the supplier
# key, same scheme as the event-point derivation above
_SLAT = "(s_suppkey * 41) % 18000"
_SLON = "(s_suppkey * 59) % 36000"
_CLAT = "(c_custkey * 37) % 18000"
_CLON = "(c_custkey * 53) % 36000"


@register(
    "q_geo_knn",
    oracle=f"""
        WITH cust AS (
            SELECT c_custkey,
                   CAST({_CLAT} AS BIGINT) AS clat,
                   CAST({_CLON} AS BIGINT) AS clon
            FROM customer
        ), supp AS (
            SELECT s_suppkey,
                   CAST({_SLAT} AS BIGINT) AS slat,
                   CAST({_SLON} AS BIGINT) AS slon
            FROM supplier
        ), ranked AS (
            SELECT c.c_custkey, s.s_suppkey,
                   (c.clat - s.slat) * (c.clat - s.slat)
                     + (c.clon - s.slon) * (c.clon - s.slon) AS d2,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.c_custkey
                       ORDER BY (c.clat - s.slat) * (c.clat - s.slat)
                                + (c.clon - s.slon) * (c.clon - s.slon),
                                s.s_suppkey
                   ) AS rn
            FROM cust c CROSS JOIN supp s
        )
        SELECT c_custkey, s_suppkey AS nearest_suppkey,
               CAST(d2 AS BIGINT) AS d2
        FROM ranked WHERE rn = 1
        ORDER BY c_custkey
    """,
    tags=("geo", "join"),
)
def q_geo_knn(spark, sf_dir):
    """Nearest supplier per customer (1-NN against a SMALL dimension):
    the geo lookup every assignment/routing pipeline runs. The
    supplier side is collapsed to ONE array row and broadcast, and
    each customer computes an exact integer argmin over it with a
    higher-order fold — vectors never shuffle, there is no join key at
    all, and the single-row build side is the audited
    q_tfidf_topk/q_kmeans broadcast class (the oracle spells the same
    argmin as a cross join + ROW_NUMBER).

    Exactness: squared planar centidegree distance in BIGINT (the
    q_geo_radius_join policy — no trig), deterministic min-suppkey
    tie-break.

    Plan at 100 TB: customers stream map-side against the broadcast
    supplier array (K suppliers ⇒ O(K) per row; for K beyond
    broadcast size this upgrades to the grid-cell candidate join of
    q_geo_radius_join with ring expansion). No shuffle on the fact.
    """
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(f"CAST({_CLAT} AS BIGINT)").alias("clat"),
        F.expr(f"CAST({_CLON} AS BIGINT)").alias("clon"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(f"CAST({_SLAT} AS BIGINT)").alias("slat"),
        F.expr(f"CAST({_SLON} AS BIGINT)").alias("slon"),
    )
    sarr = supp.agg(
        F.collect_list(F.struct("s_suppkey", "slat", "slon")).alias("sa")
    )
    best = F.expr(
        "aggregate(sa,"
        " named_struct('d2', CAST(4611686018427387904 AS BIGINT),"
        "              'sk', CAST(-1 AS BIGINT)),"
        " (acc, s) -> CASE WHEN"
        "   (clat - s.slat) * (clat - s.slat)"
        "     + (clon - s.slon) * (clon - s.slon) < acc.d2"
        "   OR ((clat - s.slat) * (clat - s.slat)"
        "       + (clon - s.slon) * (clon - s.slon) = acc.d2"
        "       AND s.s_suppkey < acc.sk)"
        " THEN named_struct('d2',"
        "   (clat - s.slat) * (clat - s.slat)"
        "     + (clon - s.slon) * (clon - s.slon),"
        "   'sk', CAST(s.s_suppkey AS BIGINT))"
        " ELSE acc END)"
    )
    return (
        cust.crossJoin(F.broadcast(sarr))
        .select("c_custkey", best.alias("best"))
        .select(
            "c_custkey",
            F.col("best.sk").alias("nearest_suppkey"),
            F.col("best.d2").alias("d2"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q_geo_path_length",
    oracle=f"""
        WITH pts AS (
            SELECT user_id, ts,
                   CAST({_LAT} AS BIGINT) AS lat,
                   CAST({_LON} AS BIGINT) AS lon
            FROM events
        ), steps AS (
            SELECT user_id,
                   abs(lat - lag(lat) OVER w) + abs(lon - lag(lon) OVER w)
                     AS step_cd
            FROM pts
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, lat, lon)
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(COALESCE(SUM(step_cd), 0) AS BIGINT) AS path_cd,
               CAST(COALESCE(MAX(step_cd), 0) AS BIGINT) AS max_step_cd
        FROM steps
        GROUP BY user_id
        ORDER BY path_cd DESC, user_id
        LIMIT 20
    """,
    tags=("geo", "window", "agg"),
)
def q_geo_path_length(spark, sf_dir):
    """Per-user trajectory length: order each user's event points by
    time and sum consecutive Manhattan centidegree steps (total path,
    sharpest jump, point count) — the movement/teleport-detection
    rollup a location pipeline runs per device. Top-20 movers with a
    total order.

    Exactness: integer |Δlat| + |Δlon| steps (the geo module's no-trig
    policy); ties in ts are totalized by (ts, lat, lon) so the lag
    sequence is deterministic.

    Plan at 100 TB: ONE shuffle on user_id feeds both the lag window
    and the rollup (the window's partition key IS the groupBy key —
    no second exchange); per-user sequences are small, so no skew.
    TakeOrdered bounds the output.
    """
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        "ts",
        F.expr(f"CAST({_LAT} AS BIGINT)").alias("lat"),
        F.expr(f"CAST({_LON} AS BIGINT)").alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "lat", "lon")
    steps = pts.select(
        "user_id",
        (
            F.abs(F.col("lat") - F.lag("lat").over(w))
            + F.abs(F.col("lon") - F.lag("lon").over(w))
        ).alias("step_cd"),
    )
    return (
        steps.groupBy("user_id")
        .agg(
            F.count("*").alias("n_points"),
            F.coalesce(F.sum("step_cd"), F.lit(0))
            .cast("long")
            .alias("path_cd"),
            F.coalesce(F.max("step_cd"), F.lit(0))
            .cast("long")
            .alias("max_step_cd"),
        )
        .orderBy(F.desc("path_cd"), "user_id")
        .limit(20)
    )
