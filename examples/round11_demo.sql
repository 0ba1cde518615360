-- Round-11 surface demo: the MATCH_RECOGNIZE features a migrating
-- Flink/ANSI user reaches for first — ALL ROWS PER MATCH (per-event
-- output with a classifier), PREV/NEXT physical navigation in DEFINE and
-- MEASURES, and FIRST/LAST logical offsets — plus the engine-native
-- EMIT ALL ROWS spelling they lower onto. Parsed end-to-end by
-- GraftAppSpec; semantics pinned there and in the q_cep_mr_rows /
-- q_cep_mr_nav oracle rows.

CREATE STREAM trades (ts TIMESTAMP, symbol STRING, kind STRING, price DOUBLE);

-- ALL ROWS PER MATCH: one output row per matched EVENT — the stream's
-- own columns, the MEASURES (FINAL semantics: constant across a match's
-- rows), mr_match_number (per-partition match identity — overlapping
-- matches share events), and mr_classifier naming the step variable.
CREATE STREAM rallyRows (ts TIMESTAMP, symbol STRING, kind STRING,
                         price DOUBLE, n_up BIGINT, mr_match_number BIGINT,
                         mr_classifier STRING);
INSERT INTO rallyRows SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(UP.price) AS n_up
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (DIP UP+) WITHIN INTERVAL '1' HOUR
  DEFINE DIP AS DIP.kind = 'dip', UP AS UP.kind = 'up'
);

-- PREV in DEFINE (physical offset from the CURRENT candidate row, per
-- symbol in event-time order) and PREV/NEXT in MEASURES (anchored at the
-- variable's last matched row); FIRST/LAST take ANSI logical offsets.
CREATE STREAM breakouts (symbol STRING, spike DOUBLE, before_dip DOUBLE,
                         after_spike DOUBLE, second_up DOUBLE);
INSERT INTO breakouts SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES SPIKE.price AS spike, PREV(DIP.price) AS before_dip,
           NEXT(SPIKE.price) AS after_spike, FIRST(UP.price, 1) AS second_up
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (DIP UP{2} SPIKE) WITHIN INTERVAL '2' HOUR
  DEFINE DIP AS DIP.kind = 'dip',
         UP AS UP.kind = 'up' AND UP.price > PREV(UP.price),
         SPIKE AS SPIKE.kind = 'spike'
);

-- The engine-native spelling MATCH_RECOGNIZE lowers onto: EMIT ALL ROWS
-- on a SEQUENCE query (per-event rows + mr_classifier appended).
CREATE STREAM seqRows (ts TIMESTAMP, symbol STRING, kind STRING,
                       price DOUBLE, dip_p DOUBLE, mr_match_number BIGINT,
                       mr_classifier STRING);
INSERT INTO seqRows
SELECT d.price AS dip_p
FROM SEQUENCE (EVERY (d=trades[kind = 'dip'] -> u=trades[kind = 'up']))
WITHIN 1 HOURS
PARTITION BY symbol
EMIT ALL ROWS;
