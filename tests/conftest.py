import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from dbt_core_gcloud_template_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_spark("tests", master="local[8]", warehouse_dir=wh)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


class FakeDbt:
    """Shared test double for the dbt-object contract that
    operators.drift.incremental_drift_model consumes (this / metrics /
    is_incremental / record_metric, plus config.get for models that
    read day-slice vars)."""

    def __init__(self, this, incremental=True):
        self.this = this
        self._inc = incremental
        self.metrics = {}
        self.config = self

    def get(self, k, d=None):
        return d

    def is_incremental(self):
        return self._inc

    def record_metric(self, name, value):
        self.metrics[name] = value
