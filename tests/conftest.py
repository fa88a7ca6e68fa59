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
