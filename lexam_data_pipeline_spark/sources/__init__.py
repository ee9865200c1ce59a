"""Storage layout helpers (SURVEY §4 writers) and external sources
(S1 HuggingFace adapter)."""

from lexam_data_pipeline_spark.sources.huggingface import (
    hf_parquet_scan,
    load_hf_dataset,
    seed_configs_from_hf,
)
from lexam_data_pipeline_spark.sources.writers import (
    write_bucketed_table,
    write_partitioned,
)

__all__ = [
    "hf_parquet_scan",
    "load_hf_dataset",
    "seed_configs_from_hf",
    "write_bucketed_table",
    "write_partitioned",
]
