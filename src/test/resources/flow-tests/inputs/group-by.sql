CREATE TEMPORARY VIEW gb_lineitem AS SELECT * FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`;
CREATE TEMPORARY VIEW gb_orders AS SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`;
CREATE TEMPORARY VIEW gb_plain AS SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n FROM gb_lineitem GROUP BY l_returnflag, l_linestatus;
CREATE TEMPORARY VIEW gb_expr_key AS SELECT year(o_orderdate) AS order_year, count(*) AS n_orders, avg(o_totalprice) AS avg_price FROM gb_orders GROUP BY year(o_orderdate);
CREATE TEMPORARY VIEW gb_global AS SELECT count(*) AS n, sum(l_extendedprice) AS total, max(l_shipdate) AS latest FROM gb_lineitem;
CREATE TEMPORARY VIEW gb_ordinal AS SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM gb_orders GROUP BY 1, 2;
CREATE TEMPORARY VIEW gb_distinct_agg AS SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers, sum(DISTINCT l_quantity) AS distinct_qty_sum FROM gb_lineitem GROUP BY l_returnflag;
CREATE TEMPORARY VIEW gb_key_only AS SELECT DISTINCT o_orderstatus, o_orderpriority FROM gb_orders;
CREATE TEMPORARY VIEW gb_agg_of_expr AS SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS disc_revenue FROM gb_lineitem GROUP BY l_suppkey
