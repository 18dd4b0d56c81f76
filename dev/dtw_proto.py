#!/usr/bin/env python3
"""Dev-only prototype for the q_x_dtw recursive-CTE oracle: runs the
candidate DuckDB SQL against a fixture dir and cross-checks every
pair's DTW distance with an independent plain-python DP.

Usage: python3 dev/dtw_proto.py [sfDir]
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

SQL = """
WITH RECURSIVE dc AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
ser AS (
  SELECT event_type, list(c ORDER BY day) AS s, CAST(count(*) AS BIGINT) AS n
  FROM dc GROUP BY 1),
pr AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.s AS xa, b.s AS yb, a.n AS na, b.n AS nb
  FROM ser a JOIN ser b ON a.event_type < b.event_type),
r AS (
  SELECT type_a, type_b, na, nb, xa, yb, CAST(1 AS BIGINT) AS i,
         list_transform(range(1, CAST(nb AS INTEGER) + 1), j ->
           CAST(list_sum(list_transform(yb[1:j], y -> abs(xa[1] - y))) AS BIGINT)) AS d
  FROM pr
  UNION ALL
  SELECT type_a, type_b, na, nb, xa, yb, i + 1,
         list_transform(range(1, CAST(nb AS INTEGER) + 1), j ->
           CAST(list_sum(list_transform(yb[1:j],
                  y -> abs(xa[CAST(i AS INTEGER) + 1] - y))) AS BIGINT)
           + list_min(list_transform(range(1, j + 1), k ->
               (CASE WHEN k = 1 THEN d[1]
                     ELSE least(d[k], d[k - 1]) END)
               - (CASE WHEN k = 1 THEN CAST(0 AS BIGINT)
                       ELSE CAST(list_sum(list_transform(yb[1:CAST(k AS INTEGER) - 1],
                              y -> abs(xa[CAST(i AS INTEGER) + 1] - y))) AS BIGINT) END))))
  FROM r WHERE i < na)
SELECT type_a, type_b, na AS n_a, nb AS n_b,
       d[CAST(nb AS INTEGER)] AS dtw,
       round(CAST(d[CAST(nb AS INTEGER)] AS DOUBLE) / (na + nb), 6) AS dtw_norm
FROM r WHERE i = na ORDER BY type_a, type_b
"""


def dtw(x, y):
    n, m = len(x), len(y)
    INF = float("inf")
    prev = [INF] * (m + 1)
    for i in range(1, n + 1):
        cur = [INF] * (m + 1)
        for j in range(1, m + 1):
            c = abs(x[i - 1] - y[j - 1])
            best = min(prev[j], prev[j - 1], cur[j - 1])
            cur[j] = c + (0 if (i == 1 and j == 1) else best)
        prev = cur
    return prev[m]


con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
rows = con.execute(SQL).fetchall()
series = {t: s for t, s in con.execute(
    "SELECT event_type, list(c ORDER BY day) FROM (SELECT event_type,"
    " CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS c FROM events"
    " GROUP BY 1,2) GROUP BY 1").fetchall()}
ok = True
for ta, tb, na, nb, d, dn in rows:
    ref = dtw(series[ta], series[tb])
    mark = "OK " if ref == d else "BAD"
    if ref != d:
        ok = False
    print(f"{mark} {ta:>10} {tb:>10} n=({na},{nb}) sql={d} ref={ref} norm={dn}")
print("ALL OK" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
