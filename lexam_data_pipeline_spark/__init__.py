"""lexam_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``MHGanainy/lexam_data_pipeline`` (a
FastAPI + PostgreSQL + LLM-batch pipeline), extended with the operators a
large-scale LLM training-data pipeline needs (dedup, similarity search,
multimodal columns, text analysis).

Design principles (see SURVEY.md):

* Everything is declared with the DataFrame / SQL API so Catalyst supplies
  predicate pushdown, column pruning, join reordering and AQE for free.
* Small dimension tables are broadcast; big joins shuffle on their keys.
* Python UDFs only where built-ins genuinely cannot express the semantics
  (the LLM call, multimodal decode); always Arrow-batched, never per-row.
* Exact aggregates (``percentile``, ``count_distinct``) for oracle parity,
  with documented approximate variants for the 100 TB path.
"""

__version__ = "0.1.0"

from lexam_data_pipeline_spark.session import get_spark  # noqa: F401
