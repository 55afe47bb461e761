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
         LAST_VALUE(CASE WHEN tag = 0 THEN event_id END) IGNORE NULLS OVER (
           PARTITION BY user_id ORDER BY ts_us, tag
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r_event_id,
         LAST_VALUE(CASE WHEN tag = 0 THEN ts_us END) IGNORE NULLS OVER (
           PARTITION BY user_id ORDER BY ts_us, tag
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r_ts_us,
         LAST_VALUE(CASE WHEN tag = 0 THEN value END) IGNORE NULLS OVER (
           PARTITION BY user_id ORDER BY ts_us, tag
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r_value
  FROM unioned
)
SELECT event_id AS l_event_id, user_id, ts_us AS l_ts_us,
       r_event_id, r_ts_us, r_value
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
