-- Round-15 surface demo: variable-count NESTED pattern groups (a second
-- iteration frame), quantified PERMUTE (the per-ordering PERMUTE-loop),
-- reluctant groups with variable-count members (two-level preference),
-- MAP DDL columns, and the COMPOSABLE streaming sketch datacard (any
-- mix of sketch + plain aggregates, one stateful pass, tumbling or
-- hopping windows, HAVING over the plain aggregates). Parsed end-to-end
-- by GraftAppSpec; semantics pinned there, in StreamingSpec parity
-- tests, and in the q_cep_mr_nested / q_cep_mr_permute_quant /
-- q_map_cols oracle rows.

CREATE STREAM trades (ts TIMESTAMP, symbol STRING, kind STRING, price DOUBLE);

-- Variable-count NESTED group ((DIP UP){1,3} BRK)+: each breakout is
-- preceded by ONE TO THREE dip/up pairs — the inner group's iteration
-- count varies PER OUTER ITERATION (round 14 required an exact inner
-- count). The inner pairs gate on the nested iteration frame; measures
-- aggregate the members across all outer x inner iterations directly.
CREATE STREAM wedges (symbol STRING, n_dips BIGINT, n_brk BIGINT, s_up DOUBLE);
INSERT INTO wedges SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(DIP.price) AS n_dips, count(BRK.price) AS n_brk,
           sum(UP.price) AS s_up
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (OPEN1 ((DIP UP){1,3} BRK)+) WITHIN INTERVAL '1' HOUR
  DEFINE OPEN1 AS OPEN1.kind = 'open', DIP AS DIP.kind = 'dip',
         UP AS UP.kind = 'up', BRK AS BRK.kind = 'breakout'
);

-- Quantified PERMUTE: one to two fill/hedge pairs in EITHER order — the
-- interleaving is chosen per match and repeats across iterations (the
-- engine PERMUTE-loop: one looped chain per ordering, one shared NFA
-- pass).
CREATE STREAM paired (symbol STRING, n_fills BIGINT, f1 DOUBLE);
INSERT INTO paired SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(FILL.price) AS n_fills, FIRST(FILL.price) AS f1
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (OPEN1 PERMUTE(FILL, HEDGE){1,2}) WITHIN INTERVAL '1' HOUR
  DEFINE OPEN1 AS OPEN1.kind = 'open', FILL AS FILL.kind = 'fill',
         HEDGE AS HEDGE.kind = 'hedge'
);

-- Reluctant group with a VARIABLE-count member: the SHORTEST
-- accumulation phase — fewest iterations first, then fewest up-ticks
-- per iteration (round 14 rejected the variable member under '?').
CREATE STREAM scalps (symbol STRING, n_dips BIGINT, n_ups BIGINT);
INSERT INTO scalps SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(DIP.price) AS n_dips, count(UP.price) AS n_ups
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN ((DIP UP+)+?) WITHIN INTERVAL '1' HOUR
  DEFINE DIP AS DIP.kind = 'dip', UP AS UP.kind = 'up'
);

-- MAP DDL column: per-trade tag map built with a data-dependent key,
-- element access in projection and WHERE, key-list functions.
CREATE STREAM tagged (symbol STRING, kv MAP<STRING, DOUBLE>);
CREATE STREAM hot (symbol STRING, dipped DOUBLE, nk BIGINT);
INSERT INTO tagged SELECT symbol, map(kind, price) AS kv FROM trades;
INSERT INTO hot SELECT symbol, kv['dip'] AS dipped,
  CAST(size(map_keys(kv)) AS BIGINT) AS nk
FROM tagged WHERE kv['dip'] IS NOT NULL;

-- The COMPOSABLE streaming datacard (round 14 allowed ONE sketch per
-- streaming query and no plain aggregates): distinct symbols, top
-- symbols, p50 price, and row counters per kind per hour — ONE
-- flatMapGroupsWithState pass, state = sum of sketch k + histogram
-- buckets + O(1) counters per (kind, window), watermark-evicted;
-- HAVING prunes thin windows post-kernel.
CREATE STREAM ticker (ts TIMESTAMP, symbol STRING, kind STRING, price DOUBLE)
  WITH ('allow.lateness'='10 minutes');
CREATE STREAM datacard (win_start TIMESTAMP, kind STRING, du BIGINT,
                        hh ARRAY<STRING>, p50 DOUBLE, n BIGINT, s DOUBLE);
INSERT INTO datacard SELECT kind, kmv_distinct(symbol, 1024) AS du,
  heavy_hitters(symbol, 16) AS hh, hist_quantile(price, 500) AS p50,
  count(*) AS n, sum(price) AS s
FROM ticker WINDOW('timeBatch', '1 hour') GROUP BY kind
HAVING count(*) >= 100;

-- The same shape over a HOPPING window: each event lands in
-- size/slide covering windows, enumerated map-side into the SAME single
-- stateful operator.
CREATE STREAM datacard_hop (win_start TIMESTAMP, kind STRING, du BIGINT, n BIGINT);
INSERT INTO datacard_hop SELECT kind, kmv_distinct(symbol, 1024) AS du,
  count(*) AS n
FROM ticker WINDOW('sliding', '1 hour', '15 minutes') GROUP BY kind;
