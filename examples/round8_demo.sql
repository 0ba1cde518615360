-- Round-8 surface demo: the REAL network transports (RFC 6455 WebSocket,
-- AMQP 0-9-1) bound declaratively on both halves, with the json/csv line
-- mappers and fault routing unchanged. Runnable via graft.sql.RunApp /
-- AppRuntime.start against a live endpoint (the specs drive the same apps
-- against in-process servers).

-- WebSocket SOURCE: the frames' text payloads are csv-mapped into the
-- declared schema; garbage frames route to the implicit !WsTicks stream
CREATE STREAM WsTicks (symbol STRING, price DOUBLE)
WITH ('type' = 'source', 'format' = 'websocket',
      'host' = 'feed.example.com', 'port' = '8080', 'path' = '/ticks',
      'on.error' = 'stream');

-- AMQP SOURCE: basic.consume (no-ack) on a declared queue; nested-JSON
-- message bodies map via JSONPath
CREATE STREAM Orders (oid BIGINT, amount DOUBLE, city STRING)
WITH ('type' = 'source', 'format' = 'rabbitmq',
      'host' = 'broker.example.com', 'port' = '5672', 'queue' = 'orders',
      'json.mapping.oid' = '$.order.id',
      'json.mapping.amount' = '$.order.total');

-- a windowed join across the two live feeds
CREATE STREAM Enriched (symbol STRING, price DOUBLE, city STRING);
INSERT INTO Enriched
SELECT W.symbol AS symbol, W.price AS price, O.city AS city
FROM WsTicks AS W JOIN Orders AS O WINDOW('time', 30 sec)
  ON W.price > O.amount;

-- WebSocket SINK: rows leave as client-masked text frames, shaped by the
-- json template mapper
CREATE STREAM Alerts (symbol STRING, price DOUBLE)
WITH ('type' = 'sink', 'format' = 'websocket',
      'host' = 'ops.example.com', 'port' = '9090',
      'json.template' = '{"sym":"{{symbol}}","px":{{price}}}');
INSERT INTO Alerts SELECT symbol, price FROM WsTicks WHERE price > 1000;

-- AMQP SINK: one basic.publish per row to the default exchange
CREATE STREAM Audit (symbol STRING, price DOUBLE)
WITH ('type' = 'sink', 'format' = 'rabbitmq',
      'host' = 'broker.example.com', 'port' = '5672', 'queue' = 'audit',
      'map.format' = 'csv');
INSERT INTO Audit SELECT symbol, price FROM WsTicks;
