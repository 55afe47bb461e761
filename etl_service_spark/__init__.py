"""etl_service_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference ETL service
(Mountainman97/ETL-Service, a C#/.NET metadata-driven ETL orchestrator —
see SURVEY.md) re-expressed Spark-first:

- ``operators/``  — data-plane operators (COPY, time-sliced COPY, SQL
  exec, schema alignment + audit columns, CSV export, file ingest,
  dedup family, similarity search, text analysis, multimodal columns).
- ``sources/``    — connector registry + readers (parquet, CSV, JDBC,
  Excel-gated), the analogue of ``conf.Datenverbindungen``.
- ``functions/``  — expression library: placeholder templating,
  cross-engine deterministic hashing/tokenization, exact decimal
  aggregation helpers.
- ``plans/``      — control plane: catalog of config entities, run-log
  model + analytics, scheduler calculus, DAG orchestrator, workflow
  state machine.
- ``streaming/``  — Structured Streaming ingestion of the events table.

Everything here is built only on the public Apache Spark API.
"""

__version__ = "0.1.0"
