-- Round-5 surface demo: event-count output rates, bounded cache tables,
-- calendar cron triggers, validated sort windows, lenient math, and
-- mid-chain streaming NOT patterns. Runnable via graft.sql.RunApp with the
-- events parquet table bound.

CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING);

-- bounded cache table (reference cache_table.rs max_size): FIFO keeps the
-- newest 100 rows across inserts
CREATE TABLE recent_errors (event_id BIGINT, user_id BIGINT) WITH ('max_size' = '100');
INSERT INTO recent_errors SELECT event_id, user_id FROM events WHERE event_type = 'error';

-- calendar cron trigger: first day of every month at midnight (dom/mon/dow
-- fields gate the tick calendar; */7 minutes would be a typed error)
CREATE TRIGGER MonthlyRollup AT '0 0 1 * *';

-- event sampling: per-user top-1-of-block via the frequent/sort windows is
-- SQL-surface; count-based OUTPUT rate limiting (output_rate.rs Events
-- mode) is the q_rate_events / Windows.outputEveryN operator form — an
-- OUTPUT clause in SQL is a typed error here, as in the reference grammar
CREATE STREAM HotUsers (user_id BIGINT);
INSERT INTO HotUsers SELECT user_id FROM events WINDOW('frequent', 3, user_id);

-- sort window, reference quoted-order spelling; criteria are validated
-- (a constant or a typo like 'ascending' is a compile error)
CREATE STREAM TopValues (user_id BIGINT, event_id BIGINT, value DOUBLE);
PARTITION WITH (user_id OF events) BEGIN
  INSERT INTO TopValues SELECT user_id, event_id, value FROM events
  WINDOW('sort', 3, value, 'desc')
  ORDER BY user_id, value DESC, event_id;
END;

-- lenient math (divide.rs): a zero divisor yields NULL, never an error
CREATE STREAM Ratios (event_id BIGINT, ratio DOUBLE);
INSERT INTO Ratios SELECT event_id, value / (value - value) AS ratio FROM events LIMIT 5;

-- mid-chain absent pattern: purchase directly after signup with NO error
-- event in the gap (round-4/5 MidGuard lowering, batch + streaming)
CREATE STREAM CleanConversions (user_id BIGINT, signup_id BIGINT, buy_id BIGINT);
INSERT INTO CleanConversions
SELECT e1.user_id AS user_id, e1.event_id AS signup_id, e2.event_id AS buy_id
FROM PATTERN (EVERY (e1=events[event_type = 'signup']
  -> NOT events[event_type = 'error']
  -> e2=events[event_type = 'purchase']))
WITHIN 24 HOURS
PARTITION BY user_id;
