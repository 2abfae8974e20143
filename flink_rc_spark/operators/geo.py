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
