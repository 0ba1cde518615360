-- Round-6 surface demo: WITH ctes, UNION / UNION ALL, SELECT DISTINCT,
-- IN (SELECT …) membership, CREATE AGGREGATION cascades, and mapper fault
-- routing. Runnable via graft.sql.RunApp with the events parquet table
-- bound.

CREATE STREAM events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING);

-- fault routing (stream_junction.rs OnErrorAction): unparseable source
-- lines land on the implicit !RawFeed fault stream instead of the app
CREATE STREAM RawFeed (id BIGINT, v DOUBLE) WITH ('on.error' = 'stream');

-- CTE + IN-subquery: big spenders = users whose single purchase tops 400,
-- membership-filtered activity without repeating the subquery
CREATE STREAM BigSpenderActivity (user_id BIGINT, event_id BIGINT, event_type STRING);
WITH BigSpenders AS (
  SELECT user_id, max(value) AS top_buy FROM events
  WHERE event_type = 'purchase' GROUP BY user_id HAVING max(value) > 400
)
INSERT INTO BigSpenderActivity
SELECT user_id, event_id, event_type FROM events
WHERE user_id IN (SELECT user_id FROM BigSpenders)
ORDER BY user_id, event_id;

-- UNION (distinct) between branches: one deduped stream of every user id
-- that errored or cancelled; UNION ALL would keep per-branch multiplicity
CREATE STREAM FlaggedUsers (user_id BIGINT);
INSERT INTO FlaggedUsers
SELECT user_id FROM events WHERE event_type = 'error'
UNION
SELECT user_id FROM events WHERE event_type = 'cancel';

-- NOT IN anti-membership against a passive table
CREATE TABLE allowlist (user_id BIGINT);
CREATE STREAM Suspect (user_id BIGINT, value DOUBLE);
INSERT INTO Suspect SELECT user_id, value FROM events
WHERE value > 900.0 AND user_id NOT IN (SELECT user_id FROM allowlist);

-- aggregation cascade (aggregation_definition.rs): minute→hour grains,
-- queried on demand for one window of one grain
CREATE AGGREGATION ByType FROM events GROUP BY event_type AGGREGATE value BY ts EVERY minute TO hour;
CREATE STREAM HourlyTotals (event_type STRING, bucket TIMESTAMP, sum_v DOUBLE);
INSERT INTO HourlyTotals
SELECT event_type, bucket, sum_v FROM ByType
WITHIN '1970-01-01' AND '2100-01-01' PER 'hour' ORDER BY event_type, bucket;

-- SELECT DISTINCT projection dedup
CREATE STREAM EventKinds (event_type STRING);
INSERT INTO EventKinds SELECT DISTINCT event_type FROM events;

-- LLM-ops scalar extensions resolve by name in app SQL (GraftFns):
-- token-count gates on the props payload, like a curation quality filter
CREATE STREAM DenseProps (event_id BIGINT, n_tokens BIGINT);
INSERT INTO DenseProps SELECT event_id, token_count(props) AS n_tokens
FROM events WHERE props IS NOT NULL AND token_count(props) >= 2
ORDER BY event_id;
