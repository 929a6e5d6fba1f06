"""PySpark-native analytics engine with the query & data-processing
capabilities of valery-shinkevich/flume-hive-batched-sink.

The reference (a Flume→Hive batched ORC sink, 17 Scala files) is a
streaming micro-batch landing job: parse text events → route into
time-bucketed Hive partitions → columnar write → windowed counters →
bookkeeping/completeness. This package re-expresses that surface —
plus a full relational analytics layer and LLM-data-pipeline
operators — Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the streaming form, Pandas UDFs
only where built-ins cannot express the semantics.

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow enabled)
    catalog.py    testdata table loader / temp-view registry
    config.py     SinkConfig dataclass (mirrors reference Config.scala)
    functions/    scalar + partition-routing column functions
    sources/      text→typed-row parsing (serde registry)
    operators/    relational + north-star operators (queries() surface)
    streaming/    Structured Streaming forms: windows, landing, counters
    plans/        plan inspection helpers (explain, shuffle audit)
"""

__version__ = "0.1.0"
