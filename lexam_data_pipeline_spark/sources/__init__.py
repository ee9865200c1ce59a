"""Storage layout helpers: partitioned + bucketed writers (SURVEY §4 —
the Spark analog of the reference's B-tree indexes)."""

from lexam_data_pipeline_spark.sources.writers import (
    write_bucketed_table,
    write_partitioned,
)

__all__ = ["write_bucketed_table", "write_partitioned"]
