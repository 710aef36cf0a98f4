"""pg2any_spark — a PySpark-native CDC-apply + analytics engine.

A from-scratch re-expression of the capabilities of ``isdaniel/pg2any``
(a PostgreSQL logical-replication → MySQL/SQLServer/SQLite/Kafka CDC
replicator) on top of Apache Spark:

- the CDC change-event envelope and ordered, exactly-once apply
  semantics become a DataFrame/Structured-Streaming pipeline
  (``operators.apply``, ``streaming.pipeline``);
- the reference's DML-rewrite optimizer (multi-value INSERT,
  CASE-WHEN / VALUES-JOIN UPDATE, OR-combined DELETE — its
  ``coalescing.rs``) collapses into Catalyst-planned MERGE-style set
  operations — no SQL-string round-trips;
- destination dialects (quoting/literal rendering) are kept as a thin
  parity layer (``functions.dialects``) for byte-compatible SQL output;
- the full relational operator surface (joins, aggregations, windows,
  sorts, set ops) the reference lacks is exposed via Spark SQL
  (``plans.queries``);
- large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal columns) are first-class
  (``operators.dedup`` / ``similarity`` / ``text`` / ``multimodal``).

Everything is built on the public PySpark DataFrame API and designed
for multi-executor scale: declarative plans (Catalyst optimizes),
map-side-combinable aggregations over per-key windows where possible,
broadcast joins for dimensions, Arrow-vectorized pandas UDFs only
where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

from pg2any_spark.session import get_spark  # noqa: F401
