"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference weather pipeline
(storcode/api_weather_kafka_clickhouse: OpenWeatherMap API -> Kafka ->
ClickHouse), re-expressed idiomatically on DataFrame / Spark SQL /
Catalyst / Structured Streaming.

Layout
------
- ``session``    : SparkSession factory (scale-aware defaults).
- ``tables``     : testdata table loaders / temp-view registration.
- ``registry``   : the (name -> spark query, oracle SQL) registry that
                   backs ``__spark_entry__.py``'s driver contract.
- ``sources/``   : ingest layer — city dimension, HTTP weather source
                   (injectable), Kafka config, raw-payload schemas.
- ``functions/`` : scalar/text/vector function library (built-in-first).
- ``operators/`` : relational + LLM-data operators (joins, aggs,
                   windows, dedup, similarity, text analysis).
- ``streaming/`` : Structured Streaming pipeline (micro-batch parity
                   with the reference consumer) + event-time layer.
- ``plans/``     : plan-inspection helpers (pushdown/broadcast checks).
"""

__version__ = "0.1.0"
