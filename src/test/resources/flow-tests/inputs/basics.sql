CREATE TEMPORARY VIEW g_nation AS SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`;
CREATE TEMPORARY VIEW g_counts AS SELECT n_regionkey, count(*) AS n, max(n_name) AS top_name FROM g_nation GROUP BY n_regionkey;
CREATE TEMPORARY VIEW g_filtered AS SELECT n_regionkey, n FROM g_counts WHERE n > 3 ORDER BY n DESC LIMIT 3
