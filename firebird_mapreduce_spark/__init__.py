"""firebird_mapreduce_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
``hjk41/firebird-mapreduce`` reference (a single-machine OpenMP MapReduce
teaching library: ``/root/reference/firebird.h:17-249``), extended with the
relational/streaming catalog classically expressible in the MapReduce model
plus LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns), all designed for 100 TB-scale execution on a Spark
cluster.

Layout
------
- ``session``    — SparkSession builder with scale-sane defaults (AQE on).
- ``sources``    — table readers/writers over parquet/csv/json + binary.
- ``mapreduce``  — the idiomatic successor of the reference's
  ``MapReduceScheduler`` (user map/reduce as Arrow-batched pandas
  functions) and the iterate-to-fixpoint driver.
- ``operators``  — relational, graph, dedup, similarity, text, multimodal.
- ``functions``  — reusable column expressions (vector math, hashing).
- ``plans``      — plan-inspection helpers (pushdown/broadcast assertions).
- ``streaming``  — Structured Streaming twins of the batch operators.
"""

__version__ = "0.1.0"
