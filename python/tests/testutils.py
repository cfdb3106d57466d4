"""Shared pyspark fixture for the sqlflow façade tests.

One SparkSession per test run, with the graft jar on the driver classpath
(py4j resolves `_jvm.org.apache.spark.api.python.SQLFlowApi` through the
driver's system classloader, so `spark.driver.extraClassPath` is the
reliable channel; `spark.jars` alone lands in a child classloader that the
py4j view may not search).

Pass the jar via the `SQLFLOW_LIB` env var (the runner script sets it to
`target/scala-2.13/<jar>`), mirroring the reference's test harness
(reference: python/tests/test_sqlflow.py:35).
"""

import glob
import os
import unittest

from pyspark.sql import SparkSession


def _find_jar() -> str:
    jar = os.environ.get("SQLFLOW_LIB")
    if jar:
        return jar
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(here))
    hits = sorted(glob.glob(os.path.join(repo, "target", "scala-2.13", "*.jar")))
    if not hits:
        raise RuntimeError("graft jar not found: run `sbt package` or set SQLFLOW_LIB")
    return hits[-1]


class ReusedSQLTestCase(unittest.TestCase):
    spark: SparkSession = None

    @classmethod
    def setUpClass(cls):
        jar = _find_jar()
        cls.spark = (
            SparkSession.builder.master("local[4]")
            .appName("sqlflow-python-tests")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.jars", jar)
            .config("spark.driver.extraClassPath", jar)
            .getOrCreate()
        )

    @classmethod
    def tearDownClass(cls):
        if cls.spark is not None:
            cls.spark.stop()

    def setUp(self):
        assert self.spark.sql("SHOW VIEWS").count() == 0, "leftover views from a previous test"

    def tearDown(self):
        for r in self.spark.sql("SHOW VIEWS").collect():
            if r.isTemporary:
                self.spark.catalog.dropTempView(r.viewName)
