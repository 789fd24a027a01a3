"""console_etl_spark — a PySpark-native analytics engine.

Built from scratch with the query and data-processing capabilities of the
reference (joelanford/console-etl): ingest of semi-structured JSON document
streams into a partitioned, snapshot-versioned Parquet store with atomic
manifest publication and freshness-aware refresh, plus the reference's full
query surface (distinct-key listings, multi-key point lookups, filtered name
projections, nested/binary field extraction) expressed as Catalyst-optimized
DataFrame plans.

Extension tiers (driver-mandated, not in the reference): relational suite
(joins, aggregations, windows, set ops, top-k), LLM-data-pipeline operators
(exact/near-duplicate dedup, vector similarity search, text analysis,
multimodal binary columns) and Structured Streaming — every operator designed
for 100 TB scale: partition-pruned reads, no driver-side collects in the
dataflow, broadcast-bounded joins, AQE on.
"""

__version__ = "0.1.0"
