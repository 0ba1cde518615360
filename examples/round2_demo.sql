-- Round-2 surface demo: triggers, table DML, partitioned patterns with
-- cross-step predicates, range partitions. Runnable via graft.sql.RunApp
-- with the events/customer parquet tables bound.

CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING);
CREATE TABLE balances (user_id BIGINT, bal DOUBLE);
CREATE STREAM adjustments (user_id BIGINT, bal DOUBLE);
CREATE TRIGGER Heartbeat AT EVERY 30 SECONDS;

-- table DML executes in statement order against the table env
UPDATE OR INSERT INTO balances SELECT user_id, bal FROM adjustments
ON balances.user_id = adjustments.user_id;

-- per-user pattern: a view followed by a purchase worth >2x the viewed value,
-- where the first purchase that qualifies wins (NFA-side comparison)
CREATE STREAM TrendAlerts (user_id BIGINT, view_id BIGINT, buy_id BIGINT);
INSERT INTO TrendAlerts
SELECT e1.user_id AS user_id, e1.event_id AS view_id, e2.event_id AS buy_id
FROM PATTERN (EVERY (e1=events[event_type = 'view']
  -> e2=events[event_type = 'purchase' AND value > 2 * e1.value]))
WITHIN 2 HOURS
PARTITION BY user_id;

-- range partition: per-band aggregation; events outside all bands drop
CREATE STREAM BandTotals (pkey STRING, n BIGINT, total DOUBLE);
PARTITION WITH (value < 10 AS 'small' OR value >= 10 AS 'large' OF events) BEGIN
  INSERT INTO BandTotals SELECT count(event_id) AS n, round(sum(value), 2) AS total FROM events
END;
