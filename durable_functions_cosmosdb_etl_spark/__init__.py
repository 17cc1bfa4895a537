"""durable_functions_cosmosdb_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL sample (ralarcon/durable-functions-cosmosdb-etl: a Durable
Functions + Cosmos DB extract→load→incremental-transform pipeline,
/root/reference/EtlProcess.cs), widened to a full analytic operator
surface (joins/aggregates/windows/set-ops/scalar functions), a
Structured-Streaming incremental layer, and the LLM-training-data
operators (dedup, similarity search, text analysis, multimodal columns)
required by the north star.

Design stance (100 TB posture):
- Everything is declared through the DataFrame/SQL API so Catalyst owns
  predicate pushdown, column pruning, join selection, and AQE re-planning.
- No driver-side row loops; no ``collect()`` in any operator path.
- Small dimensions are broadcast; big joins shuffle on their keys;
  skew-prone paths document their salting recipe.
- Python crosses the JVM boundary only through Arrow-batched pandas UDFs,
  and only where built-in expressions cannot express the semantics.
"""

__version__ = "0.1.0"
