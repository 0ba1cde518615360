-- Round-9 surface demo: the Kafka wire-protocol connector (partition-
-- parallel, replayable offsets), the HTTP webhook pair, wss:// TLS, and
-- driver-buffer backpressure. Runnable via graft.sql.RunApp /
-- AppRuntime.start; KafkaSpec/HttpSpec/ConnectorSpec drive the same apps
-- against in-process brokers/servers.

-- Kafka SOURCE: real wire protocol (Metadata/ListOffsets/Fetch, record
-- batch v2 + CRC32C), one Spark task per Kafka partition, per-partition
-- offsets checkpointed by Spark — a restart REPLAYS the committed ranges.
-- The csv line mapper shapes the record values.
CREATE STREAM Trades (symbol STRING, qty BIGINT, price DOUBLE)
WITH ('type' = 'source', 'format' = 'kafka',
      'brokers' = 'broker.example.com:9092', 'topic' = 'trades',
      'startingOffsets' = 'earliest', 'map.format' = 'csv',
      'tls' = 'true', 'tls.truststore' = '/etc/graft/kafka-truststore.p12',
      'tls.truststore.password' = '${KAFKA_TRUST_PW:-changeit}',
      'sasl.user' = 'svc-graft', 'sasl.pass' = '${KAFKA_SASL_PW:-secret}');

-- Kafka metadata access: a schema drawn from the physical columns
-- (key, value, partition, offset, ts_ms) projects them directly
CREATE STREAM TradesRaw (value STRING, partition INT, offset BIGINT)
WITH ('type' = 'source', 'format' = 'kafka',
      'brokers' = 'broker.example.com:9092', 'topic' = 'trades');

-- HTTP SOURCE: an embedded webhook receiver; POST bodies are json-mapped.
-- The driver buffer is CAPPED: past 50k pending messages the reader
-- parks and TCP flow control pushes back on producers ('overflow'='drop'
-- would count-and-discard instead).
CREATE STREAM Signals (name STRING, level DOUBLE)
WITH ('type' = 'source', 'format' = 'http',
      'port' = '8088', 'path' = '/ingest',
      'max.buffered' = '50000', 'overflow' = 'block',
      'json.mapping.name' = '$.signal', 'json.mapping.level' = '$.value');

-- wss:// SOURCE: the RFC 6455 transport over JSSE TLS with a pinned
-- truststore and hostname verification
CREATE STREAM SecureTicks (symbol STRING, price DOUBLE)
WITH ('type' = 'source', 'format' = 'websocket',
      'host' = 'feed.example.com', 'port' = '443', 'path' = '/ticks',
      'tls' = 'true',
      'tls.truststore' = '/etc/graft/feed-truststore.p12',
      'tls.truststore.password' = '${TRUSTSTORE_PW:-changeit}');

-- a query over the replayable feed; checkpoints carry the Kafka offsets
-- AND the state-schema version marker — restarting this app on a
-- checkpoint from another build fails AT START with a typed
-- CheckpointVersionMismatch, never Spark's opaque mid-batch schema error
CREATE STREAM BigTrades (symbol STRING, notional DOUBLE)
WITH ('type' = 'sink', 'format' = 'kafka',
      'brokers' = 'broker.example.com:9092', 'topic' = 'big-trades',
      'checkpointLocation' = '/var/graft/ckpt/big-trades',
      'json.template' = '{"sym":"{{symbol}}","usd":{{notional}}}');
INSERT INTO BigTrades
SELECT symbol, qty * price AS notional FROM Trades WHERE qty * price > 1000000;

-- HTTP SINK: each alert POSTs to the webhook; a non-2xx reply fails the
-- epoch loudly instead of dropping rows
CREATE STREAM PagerAlerts (value STRING)
WITH ('type' = 'sink', 'format' = 'http',
      'url' = 'https://ops.example.com/hooks/pager',
      'content.type' = 'application/json');
INSERT INTO PagerAlerts
SELECT CAST(level AS VARCHAR) AS value FROM Signals WHERE level > 99.5;
