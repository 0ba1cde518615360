-- Round-14 surface demo: the MATCH_RECOGNIZE group-quantifier matrix
-- completed (quantified members, one-level nesting, per-iteration
-- cross-member DEFINE refs, reluctance under SKIP TO NEXT ROW), STRUCT
-- DDL columns, multi-key sketch GROUP BY + HAVING, and the streaming
-- windowed sketch face — each the app text a migrating Flink/Trino/
-- eventflux user pastes. Parsed end-to-end by GraftAppSpec; semantics
-- pinned there, in StreamingSpec parity tests, and in the
-- q_cep_mr_group_quant / q_cep_mr_iter_ref / q_cep_mr_reluctant_next /
-- q_sketch_sql_multikey / q_struct_cols oracle rows.

CREATE STREAM trades (ts TIMESTAMP, symbol STRING, kind STRING, price DOUBLE);

-- Quantified group member (A B+)+: each iteration is "one dip, then a
-- RUN of ups" — the inner + gates per iteration (round 13 rejected any
-- member quantifier). One looped NFA variant; measures aggregate the
-- accumulated member buffers.
CREATE STREAM rallies (symbol STRING, n_dips BIGINT, n_ups BIGINT, s_up DOUBLE);
INSERT INTO rallies SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(DIP.price) AS n_dips, count(UP.price) AS n_ups,
           sum(UP.price) AS s_up
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (ENTRY (DIP UP+)+ EXIT1) WITHIN INTERVAL '1' HOUR
  DEFINE ENTRY AS ENTRY.kind = 'open', DIP AS DIP.kind = 'dip',
         UP AS UP.kind = 'up', EXIT1 AS EXIT1.kind = 'close'
);

-- One-level nesting ((A B){2} C)+: the inner exact-count group inlines
-- per repetition (A__1 B__1 A__2 B__2 C), measures over A union the
-- inlined aliases automatically.
CREATE STREAM ladders2 (symbol STRING, n_a BIGINT, n_c BIGINT);
INSERT INTO ladders2 SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(LO.price) AS n_a, count(BRK.price) AS n_c
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (((LO HI){2} BRK)+) WITHIN INTERVAL '1' HOUR
  DEFINE LO AS LO.kind = 'down', HI AS HI.kind = 'up',
         BRK AS BRK.kind = 'breakout'
);

-- Per-iteration cross-member reference in an UNBOUNDED loop (round 13
-- rejected this): each iteration's UP compares against ITS OWN
-- iteration's DIP — "every recovery beats its own dip, repeated".
CREATE STREAM vshapes (symbol STRING, n_pairs BIGINT);
INSERT INTO vshapes SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(DIP.price) AS n_pairs
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (ENTRY (DIP UP)+ EXIT1) WITHIN INTERVAL '1' HOUR
  DEFINE ENTRY AS ENTRY.kind = 'open', DIP AS DIP.kind = 'dip',
         UP AS UP.kind = 'up' AND UP.price > DIP.price,
         EXIT1 AS EXIT1.kind = 'close'
);

-- Reluctant +? composes with SKIP TO NEXT ROW (round 13 required a
-- consuming skip mode): one preferred — fewest-repetition — parse per
-- START, overlapping starts allowed.
CREATE STREAM first_ups (symbol STRING, dip_price DOUBLE, n_up BIGINT);
INSERT INTO first_ups SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES DIP.price AS dip_price, count(UP.price) AS n_up
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (DIP UP+?) WITHIN INTERVAL '1' HOUR
  DEFINE DIP AS DIP.kind = 'dip', UP AS UP.kind = 'up'
);

-- STRUCT DDL columns (reference roadmap feat/struct_type/STRUCT_TYPE.md):
-- build a struct, route it through a typed stream, project fields back.
CREATE STREAM enriched (symbol STRING, tick STRUCT<kind: STRING, px: DOUBLE>);
INSERT INTO enriched SELECT symbol,
  named_struct('kind', kind, 'px', price) AS tick FROM trades;
CREATE STREAM flat (symbol STRING, kind2 STRING, px2 DOUBLE);
INSERT INTO flat SELECT symbol, tick.kind AS kind2, tick.px AS px2
FROM enriched WHERE tick.px > 100;

-- Multi-key sketch GROUP BY + HAVING (round 13 took one key, no HAVING):
-- the day-one datacard query — distinct prices per (symbol, kind) with a
-- volume floor.
CREATE STREAM symbol_kind_card (symbol STRING, kind STRING, n BIGINT, du BIGINT);
INSERT INTO symbol_kind_card SELECT symbol, kind, count(*) AS n,
  kmv_distinct(price, 256) AS du
FROM trades GROUP BY symbol, kind HAVING count(*) >= 10;
