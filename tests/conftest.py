from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bitcoin_datawarehouse_spark.registry import load_all_operators
from bitcoin_datawarehouse_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

load_all_operators()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_warehouse(tmp_path):
    return str(tmp_path / "warehouse")
