"""PySpark-native analytics engine with the query & data-processing
capabilities of mozilla-conduit/phabricator-etl, re-expressed Spark-first.

The reference (read-only at /root/reference/) is a row-at-a-time Python ETL
(stats.py + transforms.py). This engine re-expresses every per-row loop as a
set-oriented DataFrame pipeline — see SURVEY.md for the operator inventory and
the file:line citations that anchor each implementation.

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow)
    schemas.py    explicit StructTypes for the 15 source + 8 output tables
    constants.py  enums/edge types shared with the reference semantics
    sources/      readers: parquet catalog, JDBC builder, destination readback
    functions/    column-level helpers (JSON, coercion, text analysis)
    operators/    engine operators (dedup, similarity, graph, merge/upsert)
    plans/        the 8 output-table pipelines + dimension layer
    streaming/    Structured Streaming variants (events)
"""

__version__ = "0.1.0"
