-- Round-10 surface demo: the SQL spellings that closed the corpus sweep
-- (OUTPUT rate clauses, WINDOW cron(…), PARTITION BY … OF … BEGIN/END),
-- the new pattern algebra (A*, n-ary/nested AND), JOIN USING / NATURAL
-- JOIN, the SELECT-form CREATE AGGREGATION, and the bare ad-hoc SELECT
-- subscription. Parsed end-to-end by GraftAppSpec; each construct's
-- semantics are pinned in CompatSpec/GraftAppSpec against the reference's
-- own test expectations.

CREATE STREAM stockStream (ts TIMESTAMP, symbol STRING, price DOUBLE, volume BIGINT);
CREATE STREAM newsStream (ts TIMESTAMP, symbol STRING, headline STRING);
CREATE STREAM outputStream (symbol STRING, price DOUBLE);

-- OUTPUT rate: release window results ALL/FIRST/LAST per n-event batch
-- or time bucket, or SNAPSHOT on a cadence (the reference defines these
-- semantics in its API but never gave them SQL; this surface does).
INSERT INTO outputStream
SELECT symbol, price FROM stockStream WINDOW('length', 10)
OUTPUT LAST EVERY 3 EVENTS;

CREATE STREAM tickerStream (symbol STRING, price DOUBLE);
INSERT INTO tickerStream
SELECT symbol, price FROM stockStream
OUTPUT SNAPSHOT EVERY 500 MILLISECONDS;

-- WINDOW cron('…'): calendar-gated window release (6-field cron with
-- seconds), lowered onto the fixed-period window kernels.
CREATE STREAM minuteRoll (symbol STRING, n BIGINT);
INSERT INTO minuteRoll
SELECT symbol, count(price) AS n FROM stockStream WINDOW cron('0 * * * * *')
GROUP BY symbol;

-- PARTITION BY … OF … BEGIN … END: the reference's block spelling for
-- per-key isolation — every query between BEGIN/END runs per symbol.
PARTITION BY symbol OF stockStream BEGIN
  INSERT INTO outputStream
  SELECT symbol, avg(price) AS price FROM stockStream WINDOW('length', 5);
END;

-- A* (zero-or-more) pattern step: e1 may match ZERO events — with no A
-- between, e2 alone completes the match and e1's refs read NULL.
CREATE STREAM calmThenSpike (n BIGINT, spike DOUBLE);
INSERT INTO calmThenSpike
SELECT count(e1.price) AS n, e2.price AS spike
FROM PATTERN (e1=stockStream[price < 10]* -> e2=stockStream[price > 100])
WITHIN 100 SECONDS;

-- n-ary AND: all three legs must arrive (any order) inside the horizon.
CREATE STREAM tripleConfirm (p DOUBLE);
INSERT INTO tripleConfirm
SELECT e1.price AS p
FROM PATTERN (e1=stockStream[symbol = 'IBM']
          AND e2=stockStream[symbol = 'WSO2']
          AND e3=newsStream[symbol = 'IBM'])
WITHIN 60 SECONDS;

-- JOIN USING and NATURAL JOIN lower to equality ON over the named /
-- common columns (one output column per join key, left precedence).
CREATE STREAM enriched (symbol STRING, price DOUBLE, headline STRING);
INSERT INTO enriched
SELECT symbol, price, headline
FROM stockStream WINDOW('length', 100)
JOIN newsStream WINDOW('length', 100) USING (symbol);

CREATE STREAM enrichedNatural (symbol STRING, price DOUBLE, headline STRING);
INSERT INTO enrichedNatural
SELECT symbol, price, headline
FROM stockStream WINDOW('length', 100)
NATURAL JOIN newsStream WINDOW('length', 100);

-- SELECT-form CREATE AGGREGATION (the reference's Java-heritage
-- spelling): named result column, grain range, replayed per grain by
-- the WITHIN … PER consumer query.
CREATE AGGREGATION StockAgg
SELECT symbol, AVG(price) as avgPrice
FROM stockStream
GROUP BY symbol
AGGREGATE BY ts EVERY sec...hour;

CREATE STREAM hourly (symbol STRING, avgPrice DOUBLE);
INSERT INTO hourly
SELECT symbol, avgPrice
FROM StockAgg WITHIN '2024-03-01' AND '2024-03-02' PER 'hour';

-- MATCH_RECOGNIZE: the ANSI/Flink spelling of the same pattern engine
-- (desugars onto SEQUENCE/EVERY — strict contiguity, every overlapping
-- match). DEFINE predicates may reference earlier variables (cross-step
-- refs); MEASURES navigate with FIRST/LAST and collection aggregates.
CREATE STREAM mrOut (symbol STRING, start_p DOUBLE, n_up BIGINT, end_p DOUBLE);
INSERT INTO mrOut SELECT * FROM stockStream MATCH_RECOGNIZE (
  PARTITION BY symbol
  ORDER BY ts
  MEASURES A.price AS start_p, count(B.price) AS n_up, LAST(B.price) AS end_p
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (A B+) WITHIN INTERVAL '10' MINUTES
  DEFINE A AS A.volume > 1000, B AS B.price > A.price
);

-- zorder_key(d1, d2, bits): the Z-order layout key from the scalar
-- extension registry — cluster writes so file stats stay tight on BOTH
-- dimensions (pair with repartition/sort in the writing job).
CREATE STREAM layoutKeys (symbol STRING, zkey BIGINT);
INSERT INTO layoutKeys
SELECT symbol, zorder_key(pmod(volume, 256), pmod(CAST(price AS BIGINT), 256), 8) AS zkey
FROM stockStream;

-- Bare ad-hoc SELECT (trailing statement, no INSERT INTO): the
-- reference's subscription form — results surface under a synthesized
-- __adhoc output in the run() result map.
SELECT symbol, price FROM stockStream;
