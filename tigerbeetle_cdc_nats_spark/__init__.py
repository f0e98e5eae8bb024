"""tigerbeetle_cdc_nats_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the ``stumct/tigerbeetle-cdc-nats``
CDC pipeline (reference: /root/reference, read-only), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession construction + testdata table loading
- ``schemas``    : fixed StructTypes (CDC event envelope, testdata tables, state)
- ``config``     : typed pipeline config mirroring the reference flag surface
- ``functions/`` : scalar Column->Column operators (portable numbers, enum
                   dispatch, subject routing, JSON codec)
- ``operators/`` : relational/batch operators (scan, joins, aggregates,
                   windows, dedup, text analysis, similarity)
- ``streaming/`` : Structured Streaming pipeline (source -> transform ->
                   foreachBatch sink with cursor checkpointing)
"""

__version__ = "0.1.0"
