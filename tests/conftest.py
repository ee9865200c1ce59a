from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from lexam_data_pipeline_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="lexam-tests", master="local[4]", shuffle_partitions=4,
                      extra_conf={"spark.ui.enabled": "false",
                                  # bucketed-table tests need a catalog
                                  # warehouse; keep it out of the repo
                                  "spark.sql.warehouse.dir": "/tmp/lexam-test-warehouse"})
    yield spark


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
