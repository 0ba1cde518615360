CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING);
CREATE STREAM HighValue (user_id BIGINT, event_type STRING, value DOUBLE);
CREATE STREAM Out (event_type STRING, n BIGINT, total DOUBLE);

INSERT INTO HighValue SELECT user_id, event_type, value FROM events WHERE value > 50;

INSERT INTO Out SELECT event_type, count(value) AS n, round(sum(value), 2) AS total
FROM HighValue GROUP BY event_type ORDER BY event_type;
