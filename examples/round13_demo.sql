-- Round-13 surface demo: reluctant quantifiers, the streaming faces of
-- the remaining MATCH_RECOGNIZE modes (SKIP TO FIRST|LAST, ALL ROWS over
-- zero-min patterns, WITH UNMATCHED ROWS), and the sketch aggregate SQL
-- spellings — each the app text a migrating Flink/Trino/eventflux user
-- pastes. Parsed end-to-end by GraftAppSpec; semantics pinned there, in
-- StreamingSpec parity tests, and in the q_cep_mr_reluctant /
-- q_sketch_sql oracle rows.

CREATE STREAM trades (ts TIMESTAMP, symbol STRING, kind STRING, price DOUBLE);

-- Reluctant +? (ANSI; Flink/Trino accept it): the SHORTEST run that
-- completes the match — "first confirmation after a dip", not the whole
-- rally. Needs a skip mode (the default PAST LAST ROW here): reluctance
-- is a parse preference, and SKIP TO NEXT ROW enumerates every parse.
CREATE STREAM confirmations (symbol STRING, dip_price DOUBLE, n_up BIGINT);
INSERT INTO confirmations SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES DIP.price AS dip_price, count(UP.price) AS n_up
  ONE ROW PER MATCH
  PATTERN (DIP UP+?) WITHIN INTERVAL '1' HOUR
  DEFINE DIP AS DIP.kind = 'dip', UP AS UP.kind = 'up'
);

-- ALL ROWS PER MATCH over a zero-min pattern (B? expands to a variant
-- pair): streams under a WITHIN — classifiers resolve per variant and
-- mr_match_number is one per-key counter SHARED across variants.
CREATE STREAM legs (ts TIMESTAMP, symbol STRING, kind STRING, price DOUBLE,
                    entry DOUBLE, mr_match_number BIGINT, mr_classifier STRING);
INSERT INTO legs SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES A.price AS entry
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A H? C) WITHIN INTERVAL '1' HOUR
  DEFINE A AS A.kind = 'dip', H AS H.kind = 'halt', C AS C.kind = 'up'
);

-- WITH UNMATCHED ROWS on a stream: a row is provably unmatched once the
-- watermark passes row_ts + WITHIN (any match claiming it must have
-- completed by then) — NULL measures/classifier/number, exactly the
-- batch anti-join contract, emission delayed by the WITHIN.
CREATE STREAM audited (ts TIMESTAMP, symbol STRING, kind STRING, price DOUBLE,
                       n_up BIGINT, mr_match_number BIGINT, mr_classifier STRING);
INSERT INTO audited SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(UP.price) AS n_up
  ALL ROWS PER MATCH WITH UNMATCHED ROWS
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (DIP UP+) WITHIN INTERVAL '10' MINUTE
  DEFINE DIP AS DIP.kind = 'dip', UP AS UP.kind = 'up'
);

-- Sketch aggregates in plain GROUP BY SQL: lowered to the bounded-state
-- operators (bottom-k KMV, integer histogram quantiles, Misra-Gries-
-- pruned exact heavy hitters), never to an in-memory distinct set; mixed
-- freely with plain aggregates.
CREATE STREAM symbol_card (symbol STRING, n BIGINT, traders BIGINT,
                           p95 DOUBLE, whales ARRAY<STRING>);
INSERT INTO symbol_card SELECT symbol, count(*) AS n,
  kmv_distinct(price, 256) AS traders,
  hist_quantile(price, 950, 100) AS p95,
  heavy_hitters(kind, 20) AS whales
FROM trades GROUP BY symbol ORDER BY symbol;

-- Bounded group repetition (ANSI pattern grouping): each (leg, recovery)
-- pair repeats 1-2 times before the breakout; measures over LEG/REC
-- union the repetitions automatically.
CREATE STREAM ladders (symbol STRING, n_legs BIGINT, rec_sum DOUBLE);
INSERT INTO ladders SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(LEG.price) AS n_legs, sum(REC.price) AS rec_sum
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (ENTRY (LEG REC){1,2} BREAK) WITHIN INTERVAL '1' HOUR
  DEFINE ENTRY AS ENTRY.kind = 'dip', LEG AS LEG.kind = 'down',
         REC AS REC.kind = 'up' AND REC.price > LEG.price,
         BREAK AS BREAK.kind = 'breakout'
);

-- Unbounded loop group: ANY number of (leg, recovery) pairs before the
-- breakout — the loop-back NFA edge accumulates the members' buffers
-- per iteration (WITHIN bounds the in-flight state).
CREATE STREAM long_ladders (symbol STRING, n_legs BIGINT);
INSERT INTO long_ladders SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(LEG2.price) AS n_legs
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (ENTRY2 (LEG2 REC2)+ BREAK2) WITHIN INTERVAL '1' HOUR
  DEFINE ENTRY2 AS ENTRY2.kind = 'dip', LEG2 AS LEG2.kind = 'down',
         REC2 AS REC2.kind = 'up', BREAK2 AS BREAK2.kind = 'breakout'
);
