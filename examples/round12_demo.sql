-- Round-12 surface demo: the ANSI skip-mode family a migrating
-- Flink/Trino MATCH_RECOGNIZE user pastes unchanged — the DEFAULT skip
-- mode (omitted AFTER MATCH = SKIP PAST LAST ROW, greedy leftmost
-- non-overlapping; batch AND WITHIN-bounded streaming), the
-- partial-overlap SKIP TO LAST <var> (consecutive V-shapes share their
-- peak), and single-level pattern alternation (A|B) lowering onto the
-- engine's n-ary OR steps. Parsed end-to-end by GraftAppSpec; semantics
-- pinned there and in the q_cep_mr_skip / q_cep_mr_skip_greedy /
-- q_cep_mr_skip_to / q_cep_mr_alt oracle rows.

CREATE STREAM trades (ts TIMESTAMP, symbol STRING, kind STRING, price DOUBLE);

-- ANSI default skip mode, clause OMITTED — exactly how most Flink/Trino
-- queries are written: a dip then the WHOLE greedy rally, matches never
-- overlapping, the scan resuming past each match's last row.
CREATE STREAM rallies (symbol STRING, dip_price DOUBLE, n_up BIGINT);
INSERT INTO rallies SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES DIP.price AS dip_price, count(UP.price) AS n_up
  ONE ROW PER MATCH
  PATTERN (DIP UP+) WITHIN INTERVAL '1' HOUR
  DEFINE DIP AS DIP.kind = 'dip', UP AS UP.kind = 'up'
);

-- SKIP TO LAST <var>: the textbook V-shape — each descent starts AT the
-- previous V's peak (partial overlap ANSI defines; resuming at the
-- chain's own head would loop and is rejected at compile).
CREATE STREAM vShapes (symbol STRING, start_price DOUBLE,
                       n_down BIGINT, n_up BIGINT);
INSERT INTO vShapes SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES A.price AS start_price, count(D.price) AS n_down,
           count(U.price) AS n_up
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO LAST U
  PATTERN (A D+ U+) WITHIN INTERVAL '1' HOUR
  DEFINE D AS D.price < PREV(D.price), U AS U.price > PREV(U.price)
);

-- Alternation (A|B): one engine OR step, the alias kept per alternative
-- (the unmatched branch's measures read NULL), explicit SKIP TO NEXT ROW
-- for every overlapping match.
CREATE STREAM entries (symbol STRING, dip_p DOUBLE, halt_p DOUBLE,
                       up_p DOUBLE);
INSERT INTO entries SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES DIP.price AS dip_p, HALT.price AS halt_p, UP.price AS up_p
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN ((DIP | HALT) UP) WITHIN INTERVAL '1' HOUR
  DEFINE DIP AS DIP.kind = 'dip', HALT AS HALT.kind = 'halt',
         UP AS UP.kind = 'up'
);

-- SUBSET union variable: MEASURES over MOVE = (D, U) distribute over the
-- members (count sums, min/max combine, LAST coalesces in reverse chain
-- order; a bare MOVE.x is ANSI's LAST).
CREATE STREAM swings (symbol STRING, n_moves BIGINT, swing_low DOUBLE,
                      exit_price DOUBLE);
INSERT INTO swings SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES count(MOVE.price) AS n_moves, min(MOVE.price) AS swing_low,
           LAST(MOVE.price) AS exit_price
  ONE ROW PER MATCH
  PATTERN (A D+ U+) WITHIN INTERVAL '1' HOUR
  SUBSET MOVE = (D, U)
  DEFINE D AS D.price < PREV(D.price), U AS U.price > PREV(U.price)
);

-- ALL ROWS with the full per-row toolkit: CLASSIFIER()/MATCH_NUMBER()
-- as measures, a RUNNING per-prefix aggregate next to the FINAL
-- constant, and {- DIP -} exclusion (the dip anchors and times the
-- match, feeds RUNNING, but its row is omitted from output).
CREATE STREAM rallyRows (ts TIMESTAMP, symbol STRING, kind STRING,
                         price DOUBLE, step_var STRING, match_no BIGINT,
                         ups_so_far BIGINT, ups_total BIGINT,
                         mr_match_number BIGINT, mr_classifier STRING);
INSERT INTO rallyRows SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES CLASSIFIER() AS step_var, MATCH_NUMBER() AS match_no,
           RUNNING count(UP.price) AS ups_so_far,
           FINAL count(UP.price) AS ups_total
  ALL ROWS PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN ({- DIP -} UP+) WITHIN INTERVAL '1' HOUR
  DEFINE DIP AS DIP.kind = 'dip', UP AS UP.kind = 'up'
);

-- PERMUTE: every ordering of the members — the engine's n-ary AND
-- element (arrival-order variants over one shared NFA pass).
CREATE STREAM straddles (symbol STRING, dip_p DOUBLE, halt_p DOUBLE);
INSERT INTO straddles SELECT * FROM trades MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES DIP.price AS dip_p, HALT.price AS halt_p
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (PERMUTE(DIP, HALT)) WITHIN INTERVAL '1' HOUR
  DEFINE DIP AS DIP.kind = 'dip', HALT AS HALT.kind = 'halt'
);
