-- Round-8 dialect additions surfaced by the corpus-wide parser sweep
-- (CorpusSweepSpec): every form below appears verbatim in the reference's
-- own test corpus and now compiles here. Runnable via graft.sql.RunApp.

-- double-quoted WITH keys normalize like bare/single-quoted ones
-- (sql_with_end_to_end.rs spells "timer.interval" with double quotes)
CREATE STREAM Quotes (ts TIMESTAMP, symbol STRING, price FLOAT)
WITH (type = 'source', "format" = 'file', 'path' = '/tmp/quotes.csv',
      'map.format' = 'csv');

-- parameterless count() is the dialect's event count (count_test corpus)
CREATE STREAM PerSymbol (symbol STRING, cnt BIGINT);
INSERT INTO PerSymbol
SELECT symbol, count() AS cnt FROM Quotes WINDOW('length', 100)
GROUP BY symbol;

-- AS-aliased join sides — including a SELF-join under two aliases
-- (joins.rs join_test2/3; the Java original's semantics)
CREATE STREAM Spread (symbol STRING, hi FLOAT, lo FLOAT);
INSERT INTO Spread
SELECT a.symbol AS symbol, a.price AS hi, b.price AS lo
FROM Quotes AS a WINDOW('length', 10)
JOIN Quotes AS b WINDOW('length', 10)
ON a.symbol = b.symbol WHERE a.price > b.price;

-- ON-less JOIN is the dialect's CROSS join (joins.rs join_test5)
CREATE STREAM Benchmarks (name STRING, threshold FLOAT);
CREATE STREAM Graded (symbol STRING, name STRING);
INSERT INTO Graded
SELECT Quotes.symbol AS symbol, Benchmarks.name AS name
FROM Quotes WINDOW('length', 10)
JOIN Benchmarks WINDOW('length', 10);

-- trigger schedules: AT CRON spelling and unitless AT EVERY milliseconds
CREATE TRIGGER Heartbeat AT CRON '*/5 * * * * *';
CREATE TRIGGER Refresh AT EVERY 5000;
CREATE STREAM Beats (triggered_time TIMESTAMP);
INSERT INTO Beats SELECT triggered_time FROM Heartbeat;
