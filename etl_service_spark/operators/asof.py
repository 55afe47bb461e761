"""As-of (nearest-preceding-event) join and funnel analysis over the
events table.

As-of join is the canonical "operator Spark lacks": given purchases and
clicks, attach to each purchase the same user's most recent click at or
before the purchase time. The naive formulation — equi-join on user
plus `c.ts <= p.ts`, then argmax per purchase — shuffles twice and
explodes to O(clicks × purchases) per user before cutting back down.

The Spark-first shape used here is the union + carry-forward trick:
tag click rows 0 and purchase rows 1, union them, and run ONE window
`last_value(click_attr) IGNORE NULLS OVER (PARTITION BY user ORDER BY
ts, tag)` — every purchase row then carries the nearest preceding
click's attributes. One shuffle on user_id, no pair blowup, linear in
|events|; ties (click and purchase at the same timestamp) are resolved
"click visible" by the tag in the sort key, matching the inclusive
`p.ts >= c.ts` of a native ASOF join. Clicks are first deduped to one
row per (user, ts) (max event_id) so the nearest-preceding row is
unique in both engines.

The DuckDB oracle uses its native ``ASOF LEFT JOIN`` — a genuinely
independent implementation of the same semantics, which is exactly what
an oracle should be.

At 100 TB: the union+window form is the standard Flink/kdb-style as-of
at scale — partition by key, sort within partition, single pass. Range
partitioning skew on hot users is the same problem as sessionization
(see skew.py for the salting pattern).
"""

from __future__ import annotations

from ..functions import portable as P

# events.ts fragments: the Spark-side view exposes ts_us (see
# sources/catalog.py); the DuckDB oracle converts on the fly.
TS_US = ("ts_us", "epoch_us(ts)")


def asof_join_sql(
    left_type: str = "purchase",
    right_type: str = "click",
    view: str = "events",
) -> tuple[str, str]:
    """(spark_sql, duck_sql) for the as-of join of ``left_type`` events
    to their nearest preceding ``right_type`` event per user."""
    dedup_right = f"""
  SELECT user_id, ts_us, event_id, value
  FROM (
    SELECT {{ts_us_inner}} AS ts_us, user_id, event_id, value,
           ROW_NUMBER() OVER (
             PARTITION BY user_id, {{ts_us_inner}} ORDER BY event_id DESC
           ) AS rn
    FROM {view} WHERE event_type = '{right_type}'
  ) t WHERE rn = 1
"""
    left_sel = f"""
  SELECT user_id, {{ts_us_inner}} AS ts_us, event_id
  FROM {view} WHERE event_type = '{left_type}'
"""
    spark_sql = f"""
WITH rgt AS ({dedup_right}),
lft AS ({left_sel}),
unioned AS (
  SELECT user_id, ts_us, 0 AS tag, event_id, value FROM rgt
  UNION ALL
  SELECT user_id, ts_us, 1 AS tag, event_id, CAST(NULL AS DOUBLE) AS value FROM lft
),
carried AS (
  SELECT user_id, ts_us, tag, event_id,
         -- ONE struct carry: independent per-column IGNORE NULLS
         -- windows would mix fields from DIFFERENT clicks when the
         -- nearest one has a NULL value (its value skipped, an older
         -- click's value carried) — the ASOF oracle returns all
         -- fields from the single nearest row
         LAST_VALUE(CASE WHEN tag = 0 THEN
             named_struct('event_id', event_id, 'ts_us', ts_us, 'value', value)
           END) IGNORE NULLS OVER (
           PARTITION BY user_id ORDER BY ts_us, tag
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
  FROM unioned
)
SELECT event_id AS l_event_id, user_id, ts_us AS l_ts_us,
       r.event_id AS r_event_id, r.ts_us AS r_ts_us, r.value AS r_value
FROM carried WHERE tag = 1
"""
    duck_sql = f"""
WITH rgt AS ({dedup_right}),
lft AS ({left_sel})
SELECT l.event_id AS l_event_id, l.user_id, l.ts_us AS l_ts_us,
       r.event_id AS r_event_id, r.ts_us AS r_ts_us, r.value AS r_value
FROM lft l ASOF LEFT JOIN rgt r
  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
"""
    return (
        spark_sql.format(ts_us_inner="ts_us"),
        duck_sql.format(ts_us_inner="epoch_us(ts)"),
    )


def funnel_sql(
    stages: tuple[str, str, str] = ("signup", "click", "purchase"),
    view: str = "events",
) -> tuple[str, str]:
    """Ordered-funnel conversion: users whose earliest stage-2 event is
    strictly after their earliest stage-1 event, and so on. Three hash
    aggregations on user_id; the inter-stage joins are on the (tiny)
    per-user stage tables, so AQE broadcasts them. Same SQL text for
    both engines — pure integer comparisons."""
    s1, s2, s3 = stages
    template = f"""
WITH st1 AS (
  SELECT e.user_id, MIN({{ts_us}}) AS t1 FROM {view} e
  WHERE e.event_type = '{s1}' GROUP BY e.user_id
),
st2 AS (
  SELECT e.user_id, MIN({{ts_us}}) AS t2 FROM {view} e
  JOIN st1 ON e.user_id = st1.user_id
  WHERE e.event_type = '{s2}' AND {{ts_us}} > st1.t1 GROUP BY e.user_id
),
st3 AS (
  SELECT e.user_id, MIN({{ts_us}}) AS t3 FROM {view} e
  JOIN st2 ON e.user_id = st2.user_id
  WHERE e.event_type = '{s3}' AND {{ts_us}} > st2.t2 GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM st1) AS n_{s1},
       (SELECT COUNT(*) FROM st2) AS n_{s2}_after,
       (SELECT COUNT(*) FROM st3) AS n_{s3}_after
"""
    return template.format(ts_us="ts_us"), template.format(ts_us="epoch_us(e.ts)")


def range_join_sql(
    window_us: int = 300_000_000, anchor_type: str = "signup", view: str = "events"
) -> tuple[str, str]:
    """Interval join with NO equi-key: for every anchor event, count
    ALL events (any user) in the following ``window_us`` microseconds.

    Without an equi-key Spark's only native plan is a broadcast
    nested-loop (O(anchors x events) comparisons); at 100 TB that's the
    difference between a job finishing and not. The scale shape here is
    time-binning: bucket both sides by ``window_us``-sized bins, probe
    each anchor's bin and its successor (an interval of length W can
    only land in those two), equi-join on the bin, then apply the exact
    range predicate. Each (anchor, event) pair is produced at most once
    because an event has exactly one bin. Shuffle volume is linear;
    per-bin fanout is bounded by the bin population (time-skew -> the
    same salting treatment as any hot key, skew.py).

    The DuckDB oracle is the plain inequality join (its IEJoin handles
    the small scale); same results, independent plan.
    """
    w = int(window_us)
    spark_sql = f"""
WITH sig AS (
  SELECT event_id, ts_us FROM {view} WHERE event_type = '{anchor_type}'
),
probe AS (
  SELECT event_id, ts_us, explode(array(ts_us DIV {w}, ts_us DIV {w} + 1)) AS bin
  FROM sig
),
evt AS (
  SELECT ts_us AS e_ts, ts_us DIV {w} AS bin FROM {view}
),
hits AS (
  SELECT p.event_id, COUNT(*) AS n_following
  FROM probe p JOIN evt e ON p.bin = e.bin
  WHERE e.e_ts > p.ts_us AND e.e_ts <= p.ts_us + {w}
  GROUP BY p.event_id
)
SELECT s.event_id, COALESCE(h.n_following, 0) AS n_following
FROM sig s LEFT JOIN hits h ON s.event_id = h.event_id
"""
    duck_sql = f"""
WITH sig AS (
  SELECT event_id, epoch_us(ts) AS ts_us FROM {view} WHERE event_type = '{anchor_type}'
)
SELECT s.event_id, COUNT(e.ts) AS n_following
FROM sig s LEFT JOIN {view} e
  ON epoch_us(e.ts) > s.ts_us AND epoch_us(e.ts) <= s.ts_us + {w}
GROUP BY s.event_id
"""
    return spark_sql, duck_sql


def multires_rollup_sql(view: str = "events") -> tuple[str, str]:
    """Hypertable-style multi-resolution rollup: per-type hourly and
    daily aggregates in ONE pass via GROUPING SETS (Catalyst expands
    the sets map-side; one shuffle, partial aggregation per set).
    Value sums go through DECIMAL so both engines sum exactly
    (double summation order would differ). Identical SQL both engines.
    """
    template = f"""
WITH base AS (
  SELECT event_type,
         {{ts_us}} {{idiv}} 86400000000 AS day_bucket,
         {{ts_us}} {{idiv}} 3600000000  AS hour_bucket,
         CAST(value AS DECIMAL(18,6)) AS v
  FROM {view}
)
SELECT event_type, day_bucket, hour_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(v) AS DOUBLE) AS sum_value,
       GROUPING(hour_bucket) AS is_daily
FROM base
GROUP BY GROUPING SETS ((event_type, day_bucket, hour_bucket),
                        (event_type, day_bucket))
"""
    return (
        template.format(ts_us="ts_us", idiv="DIV"),
        template.format(ts_us="epoch_us(ts)", idiv="//"),
    )


def funnel_windowed_sql(
    stages: tuple[str, str, str] = ("signup", "click", "purchase"),
    max_gap_us: int = 3_600_000_000,
    view: str = "events",
) -> tuple[str, str]:
    """Funnel with a conversion WINDOW: stage i+1 counts only within
    ``max_gap_us`` after the user's stage-i time — the form product
    analytics actually ships ("purchased within an hour of clicking"),
    where the unbounded funnel badly overcounts. Same shape and cost
    as funnel_sql: three per-user MIN aggregations, tiny inter-stage
    joins that AQE broadcasts, integer time comparisons only."""
    s1, s2, s3 = stages
    template = f"""
WITH st1 AS (
  SELECT e.user_id, MIN({{ts_us}}) AS t1 FROM {view} e
  WHERE e.event_type = '{s1}' GROUP BY e.user_id
),
st2 AS (
  SELECT e.user_id, MIN({{ts_us}}) AS t2 FROM {view} e
  JOIN st1 ON e.user_id = st1.user_id
  WHERE e.event_type = '{s2}' AND {{ts_us}} > st1.t1
    AND {{ts_us}} <= st1.t1 + {max_gap_us} GROUP BY e.user_id
),
st3 AS (
  SELECT e.user_id, MIN({{ts_us}}) AS t3 FROM {view} e
  JOIN st2 ON e.user_id = st2.user_id
  WHERE e.event_type = '{s3}' AND {{ts_us}} > st2.t2
    AND {{ts_us}} <= st2.t2 + {max_gap_us} GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM st1) AS n_{s1},
       (SELECT COUNT(*) FROM st2) AS n_{s2}_within,
       (SELECT COUNT(*) FROM st3) AS n_{s3}_within
"""
    return template.format(ts_us="ts_us"), template.format(ts_us="epoch_us(e.ts)")


def markov_transitions_sql(view: str = "events") -> tuple[str, str]:
    """First-order Markov transition matrix over each user's event
    stream: for every (prev_type -> next_type) pair, the transition
    count and its per-prev-state probability in exact ppm.

    The behavioral-model building block (next-action prediction,
    anomaly detection on improbable transitions). Reference analogue:
    the run-structure drilldowns walk step sequences the same way
    (app.R timeline queries); this generalizes them to arbitrary
    event streams.

    Scale shape: ONE shuffle on user_id for the LAG window (sorted
    within partition by (ts, event_id) — a total order, so LAG is
    deterministic), then a hash aggregate whose output is at most
    |event_type|^2 rows — the per-prev normalizing window runs on that
    tiny relation. Integer arithmetic only (ppm via integer division),
    so the cross-engine hash match is exact.
    """
    template = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY {{ts_us}}, event_id) AS prev_type
  FROM {view}
)
SELECT prev_type, event_type AS next_type,
       COUNT(*) AS n_trans,
       CAST(COUNT(*) * 1000000 {{idiv}}
            SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS BIGINT) AS p_ppm
FROM seq
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""
    return P.bi_sql(template, ts_us=TS_US, idiv=("DIV", "//"))


def top_paths_sql(view: str = "events") -> tuple[str, str]:
    """Top user paths: the first three event types of every
    (user, UTC-day) activity run, concatenated into a path string and
    counted. Sequence mining's frequent-prefix report — what a growth
    team reads to see how days with activity actually start.

    Determinism: rows are ordered by (ts, event_id) — a total order —
    and the path is assembled with MAX(CASE rn=k) pivots rather than an
    ordered string_agg (array_agg ordering guarantees differ between
    engines; the pivot form is order-free). The day index is integer
    microseconds-per-day division, identical in both engines.

    Scale shape: one shuffle on (user_id, day) for the row-number
    window (at 100 TB, hot users are bounded by events-per-day, so the
    partition key is naturally skew-capped), a per-(user, day) pivot
    aggregate, then a path-level count whose output is at most
    |event_type|^3 rows.
    """
    template = f"""
WITH ordered AS (
  SELECT user_id, {{ts_us}} {{idiv}} 86400000000 AS day, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, {{ts_us}} {{idiv}} 86400000000
           ORDER BY {{ts_us}}, event_id) AS rn
  FROM {view}
),
runs AS (
  SELECT user_id, day,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS e1,
         MAX(CASE WHEN rn = 2 THEN event_type END) AS e2,
         MAX(CASE WHEN rn = 3 THEN event_type END) AS e3
  FROM ordered WHERE rn <= 3 GROUP BY user_id, day
)
SELECT CONCAT_WS('>', e1, e2, e3) AS path, COUNT(*) AS n_user_days
FROM runs
GROUP BY CONCAT_WS('>', e1, e2, e3)
"""
    return P.bi_sql(template, ts_us=TS_US, idiv=("DIV", "//"))
