"""release_all() must clear EVERY cache, including module-local ones.

r11 VERDICT item 4: ``ml/dedup._FLAT_CACHE`` (the lineage-cut persist of
the normalized-embedding projection) survived across bench runs because
it was not registered with ``operators.caching.release_all``.  The bench
calls ``release_all()`` between timed runs; any cache it misses lets the
second pass reuse the first pass's materialization, which is exactly the
cross-run caching the bench's min-of-2 must not see.
"""

from __future__ import annotations

from lexam_data_pipeline_spark.catalog import load_table
from lexam_data_pipeline_spark.ml import dedup
from lexam_data_pipeline_spark.operators.caching import release_all


def test_release_all_clears_flat_cache(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    flat = dedup._normalized_flat(emb, dim=4, cache_key=sf_small)
    assert dedup._FLAT_CACHE.get("key") == (sf_small, 4)
    assert flat.storageLevel.useMemory  # persisted

    # same key → same persisted object (within-run reuse intact)
    assert dedup._normalized_flat(emb, dim=4, cache_key=sf_small) is flat

    release_all()
    assert dedup._FLAT_CACHE == {}
    assert not flat.storageLevel.useMemory  # unpersisted

    # next call rebuilds from scratch instead of reusing a stale handle
    rebuilt = dedup._normalized_flat(emb, dim=4, cache_key=sf_small)
    assert rebuilt is not flat
    release_all()


def test_release_hook_registered_once(spark):
    from lexam_data_pipeline_spark.operators import caching

    # importing dedup again must not duplicate the hook
    import importlib

    importlib.import_module("lexam_data_pipeline_spark.ml.dedup")
    assert caching._RELEASE_HOOKS.count(dedup._release_flat_cache) == 1
