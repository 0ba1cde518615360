CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING);
CREATE STREAM Alerts (e1_id BIGINT, e2_id BIGINT, v1 DOUBLE, v2 DOUBLE);

INSERT INTO Alerts
SELECT e1.event_id AS e1_id, e2.event_id AS e2_id, e1.value AS v1, e2.value AS v2
FROM PATTERN (e1=events[event_type = 'error' AND value > 100.0] -> e2=events[event_type = 'purchase'])
WITHIN 30 MINUTES;
