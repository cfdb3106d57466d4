CREATE TEMPORARY VIEW g_orders AS SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`;
CREATE TEMPORARY VIEW g_cube AS SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM g_orders GROUP BY CUBE(o_orderstatus, o_orderpriority);
CREATE TEMPORARY VIEW g_win AS SELECT o_orderkey, o_custkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS rn FROM g_orders;
CREATE TEMPORARY VIEW g_scalar AS SELECT o_orderkey, o_totalprice FROM g_orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM g_orders)
