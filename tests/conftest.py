"""Shared fixtures: one SparkSession per test run (slow to boot)."""

from __future__ import annotations

import pytest


def make_spark(master: str = "local[4]", shuffle_partitions: int = 8):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(master)
        .appName("textextraction-tests")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark():
    s = make_spark()
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
