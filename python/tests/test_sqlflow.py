"""Edge-set tests for the Python lineage façade.

Mirrors the coverage of the reference's python/tests/test_sqlflow.py
(auto_tracking over bare/list/tuple/dict returns, the input-frames
fallback, the disable env var) plus the save/export/to-string entry
points the reference leaves to its Scala suite. Assertions are on
NORMALIZED edge sets: deterministic counter suffixes (`_N`) and
uniquified-view suffixes (`_xxxxxxx`) both become `_X`, so the tests pin
graph SHAPE, not uid allocation order.

Run via tools/run_python_tests.sh (builds the jar, sets SQLFLOW_LIB).
"""

import functools
import os
import re
import shutil
import sys
import tempfile
import unittest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as f

from sqlflow import (
    auto_tracking,
    auto_tracking_with,
    export_data_lineage_into,
    impacted_by,
    save_data_lineage,
    to_data_lineage_string,
)
from tests.testutils import ReusedSQLTestCase


class SQLFlowTests(ReusedSQLTestCase):

    # ---- helpers -----------------------------------------------------

    def _graphviz_edges(self):
        s = to_data_lineage_string("graphviz")
        s = re.sub('_[0-9]+":', '_X":', s)
        s = re.sub('_[a-z0-9]{7}":', '_X":', s)
        return set(re.findall(r'"[a-zA-Z_0-9.]+"(?::\d+)? -> "[a-zA-Z_0-9.]+"(?::\d+)?;', s))

    def _adjacency_edges(self, sep=":"):
        s = to_data_lineage_string("adjacency_list", options={"sep": sep})
        s = re.sub("_[a-z0-9]{7}", "_X", s)
        s = re.sub("_[0-9]+", "_X", s)
        edges = set()
        for line in s.splitlines():
            if sep in line:
                src, dsts = line.split(sep, 1)
                for d in dsts.split(","):
                    edges.add(f"{src}{sep}{d}")
        return edges

    # ---- auto_tracking shapes ---------------------------------------

    def test_basics(self):
        @auto_tracking
        def transform_alpha(df):
            return df.selectExpr("id % 3 AS key", "id % 5 AS value")

        @auto_tracking_with("transform_delta")
        def transform_beta(df):
            return df.groupBy("key").agg(f.expr("collect_set(value)").alias("value"))

        @auto_tracking
        def transform_gamma(df):
            return df.where("key > 0").selectExpr("explode(value)")

        @auto_tracking
        def transform_lambda(df):
            return df.count()  # not a DataFrame: input frame gets tracked

        cnt = transform_lambda(transform_gamma(transform_beta(transform_alpha(self.spark.range(3)))))
        self.assertEqual(cnt, 2)

        self.assertEqual(self._graphviz_edges(), {
            '"Aggregate_X":0 -> "transform_delta":0;',
            '"Aggregate_X":1 -> "transform_delta":1;',
            '"Filter_X":1 -> "Project_X":0;',
            '"Generate_X":0 -> "transform_lambda":0;',
            '"Project_X":0 -> "Generate_X":0;',
            '"Project_X":0 -> "transform_alpha":0;',
            '"Project_X":1 -> "transform_alpha":1;',
            '"Range_X":0 -> "Project_X":0;',
            '"Range_X":0 -> "Project_X":1;',
            '"transform_alpha":0 -> "Aggregate_X":0;',
            '"transform_alpha":1 -> "Aggregate_X":1;',
            '"transform_delta":0 -> "Filter_X":0;',
            '"transform_delta":1 -> "Filter_X":1;',
            '"transform_lambda":0 -> "transform_gamma":0;',
        })

        self.assertEqual(self._adjacency_edges(), {
            "Range_X:Project_X",
            "Project_X:transform_alpha",
            "transform_alpha:Aggregate_X",
            "Aggregate_X:transform_delta",
            "transform_delta:Filter_X",
            "Filter_X:Project_X",
            "Project_X:Generate_X",
            "Generate_X:transform_lambda",
            "transform_lambda:transform_gamma",
        })

    def _fanout_expected_graphviz(self):
        return {
            '"Range_X":0 -> "Project_X":0;',
            '"Project_X":0 -> "transform_alpha":0;',
            '"Project_X":0 -> "transform_alpha_X":0;',
            '"transform_alpha":0 -> "Union_X":0;',
            '"transform_alpha_X":0 -> "Union_X":0;',
            '"Union_X":0 -> "Aggregate_X":0;',
            '"Aggregate_X":0 -> "transform_beta":0;',
        }

    def _run_fanout_case(self, make_return, take_frames):
        @auto_tracking
        def transform_alpha(df):
            return make_return(df.selectExpr("id % 3 AS v"), df.selectExpr("id % 5 AS v"))

        @auto_tracking
        def transform_beta(dfs):
            return functools.reduce(lambda x, y: x.union(y), take_frames(dfs)).distinct()

        df = transform_beta(transform_alpha(self.spark.range(5)))
        self.assertEqual(sorted(r.v for r in df.collect()), [0, 1, 2, 3, 4])
        self.assertEqual(self._graphviz_edges(), self._fanout_expected_graphviz())

    def test_list_case(self):
        self._run_fanout_case(lambda a, b: [a, b], lambda dfs: dfs)

    def test_tuple_case(self):
        self._run_fanout_case(lambda a, b: (a, b), lambda dfs: dfs)

    def test_dict_case(self):
        self._run_fanout_case(lambda a, b: {"df1": a, "df2": b}, lambda dfs: list(dfs.values()))

    def test_input_frames_fallback(self):
        @auto_tracking
        def terminal_stage(df):
            return None  # returns nothing: the INPUT frame is tracked

        terminal_stage(self.spark.range(4).selectExpr("id * 2 AS twice"))
        views = [r.viewName for r in self.spark.sql("SHOW VIEWS").collect()]
        self.assertEqual(views, ["terminal_stage"])
        self.assertIn('"terminal_stage"', to_data_lineage_string("graphviz"))

    def test_tracking_disabled(self):
        os.environ["SQLFLOW_AUTO_TRACKING_DISABLED"] = "1"
        try:
            @auto_tracking
            def stage(df):
                return df.selectExpr("id AS v")

            stage(self.spark.range(3))
            self.assertEqual(self.spark.sql("SHOW VIEWS").count(), 0)
        finally:
            del os.environ["SQLFLOW_AUTO_TRACKING_DISABLED"]

    # ---- save / export / to-string ----------------------------------

    def test_save_data_lineage(self):
        @auto_tracking
        def stage(df):
            return df.selectExpr("id AS v")

        stage(self.spark.range(3))
        base = tempfile.mkdtemp(prefix="sqlflow_py_")
        out = os.path.join(base, "flow")
        try:
            save_data_lineage(out, filename_prefix="lineage")
            dot = os.path.join(out, "lineage.dot")
            self.assertTrue(os.path.isfile(dot))
            with open(dot) as fh:
                self.assertIn("digraph", fh.read())
            # existing dir without overwrite → error crosses py4j
            with self.assertRaises(Exception):
                save_data_lineage(out, filename_prefix="lineage")
            # overwrite=True replaces
            save_data_lineage(out, filename_prefix="lineage", overwrite=True)
            self.assertTrue(os.path.isfile(dot))
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def test_export_data_lineage_into(self):
        @auto_tracking
        def stage(df):
            return df.selectExpr("id AS v")

        stage(self.spark.range(3))
        base = tempfile.mkdtemp(prefix="sqlflow_py_")
        out = os.path.join(base, "cy")
        try:
            export_data_lineage_into("neo4jaura", options={"outputDirPath": out})
            cy = os.path.join(out, "sqlflow.cypher")
            self.assertTrue(os.path.isfile(cy))
            with open(cy) as fh:
                body = fh.read()
            self.assertIn("CREATE CONSTRAINT", body)
            self.assertIn("MERGE", body)
            self.assertNotIn("CREATE (", body)  # MERGE-not-CREATE for graph elements
            with self.assertRaises(Exception):
                export_data_lineage_into("neo4jaura")  # outputDirPath missing
            with self.assertRaises(Exception):
                export_data_lineage_into("bolt", options={"outputDirPath": out})
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def test_to_string_formats_and_options(self):
        @auto_tracking
        def stage(df):
            return df.selectExpr("id AS v")

        stage(self.spark.range(3))
        self.assertIn("flowchart LR", to_data_lineage_string("mermaid"))
        # default separator
        self.assertIn(" -> ", to_data_lineage_string("adjacency_list"))
        # custom separator honored (the round-3 façade dropped options here)
        custom = to_data_lineage_string("adjacency_list", options={"sep": " => "})
        self.assertIn(" => ", custom)
        self.assertNotIn(" -> ", custom)
        with self.assertRaises(Exception):
            to_data_lineage_string("not_a_format")

    def test_contracted_mode(self):
        @auto_tracking
        def stage_one(df):
            return df.selectExpr("id % 3 AS key", "id AS value")

        @auto_tracking
        def stage_two(df):
            return df.groupBy("key").agg(f.sum("value").alias("total"))

        stage_two(stage_one(self.spark.range(10)))
        contracted = to_data_lineage_string("graphviz", contracted=True)
        # plan nodes are contracted away; view endpoints remain connected
        self.assertNotIn('"Aggregate_', contracted)
        self.assertNotIn('"Project_', contracted)
        self.assertIn('"stage_one"', contracted)
        self.assertIn('"stage_two"', contracted)

    def test_impacted_by(self):
        self.spark.range(10).selectExpr("id AS k", "id * 2 AS v") \
            .createOrReplaceTempView("impact_base")
        self.spark.sql("SELECT k, sum(v) AS sv FROM impact_base GROUP BY k") \
            .createOrReplaceTempView("impact_mid")
        self.spark.sql("SELECT k FROM impact_mid WHERE sv > 3") \
            .createOrReplaceTempView("impact_leaf")
        try:
            hits = impacted_by("impact_base")
            self.assertIn("impact_mid", hits)
            # impact continues through the middle view
            self.assertIn("impact_leaf", hits)
            self.assertNotIn("impact_base", hits)
            # column-level: v feeds sv only; k feeds the whole chain
            self.assertIn("impact_mid", impacted_by("impact_base", column="k"))
            self.assertEqual([], impacted_by("no_such_view"))
        finally:
            for v in ("impact_base", "impact_mid", "impact_leaf"):
                self.spark.catalog.dropTempView(v)

    def test_register_sql_functions(self):
        """Native Catalyst functions reachable from pyspark SQL — no
        Python UDF boundary, one py4j call to register."""
        from sqlflow import register_sql_functions

        register_sql_functions(self.spark)
        self.assertEqual(
            self.spark.sql("SELECT zorder_key(5, 3) AS z").head().z, 27)
        self.assertEqual(
            self.spark.sql(
                "SELECT size(winnow_fingerprints('tiny', 32, 8)) AS n").head().n, 1)
        self.assertEqual(
            self.spark.sql("SELECT size(token_shingle_hashes('a b c d', 3)) AS n").head().n, 2)
        self.assertAlmostEqual(
            self.spark.sql(
                "SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), "
                "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head().c, 1.0)
        # and lineage flows through a native-function query like any other
        self.spark.sql(
            "SELECT zorder_key(id, id + 1) AS zk FROM range(10)"
        ).createOrReplaceTempView("zorder_view")
        edges = self._graphviz_edges()
        self.assertTrue(any("zorder_view" in e for e in edges), edges)

    def test_conf_driven_listener_end_to_end(self):
        """The zero-code README path: a user sets ONLY session confs
        (spark.sql.queryExecutionListeners=ConfSQLFlowListener +
        spark.sql.flow.sink.outputDirPath) and every successful query
        appends a lineage file. queryExecutionListeners is a STATIC conf, so
        this needs a fresh JVM — the test drives a pyspark subprocess, the
        same way a real job would be submitted."""
        import subprocess
        import textwrap

        work = tempfile.mkdtemp()
        sink_dir = os.path.join(work, "lineage")
        script = textwrap.dedent(
            """
            import glob, os, sys, time
            from pyspark.sql import SparkSession

            jar = os.environ["SQLFLOW_LIB"]
            out = sys.argv[1]
            spark = (
                SparkSession.builder.master("local[2]")
                .appName("conf-listener-e2e")
                .config("spark.ui.enabled", "false")
                .config("spark.sql.shuffle.partitions", "2")
                .config("spark.jars", jar)
                .config("spark.driver.extraClassPath", jar)
                .config("spark.sql.queryExecutionListeners",
                        "org.apache.spark.sql.graft.ConfSQLFlowListener")
                .config("spark.sql.flow.sink.outputDirPath", out)
                .getOrCreate()
            )
            spark.range(10).selectExpr("id % 3 AS k").groupBy("k").count().collect()
            # the listener bus is async: wait for the lineage file to land
            deadline = time.time() + 30
            while time.time() < deadline and not glob.glob(os.path.join(out, "*", "*.dot")):
                time.sleep(0.5)
            spark.stop()
            """
        )
        script_path = os.path.join(work, "driver_script.py")
        with open(script_path, "w") as fh:
            fh.write(script)
        env = dict(os.environ)
        env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
        proc = subprocess.run(
            [sys.executable, script_path, sink_dir],
            env=env, capture_output=True, text=True, timeout=300,
        )
        self.assertEqual(proc.returncode, 0, f"subprocess failed:\n{proc.stderr[-2000:]}")
        import glob as _glob
        dots = _glob.glob(os.path.join(sink_dir, "*", "*.dot"))
        self.assertTrue(dots, f"conf-driven listener wrote no .dot under {sink_dir}")
        with open(dots[0]) as fh:
            content = fh.read()
        self.assertIn("digraph", content)
        self.assertIn("->", content)
        # the lineage root is a query node stamped with runtime props
        self.assertIn("query_", content)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    unittest.main(verbosity=2)
