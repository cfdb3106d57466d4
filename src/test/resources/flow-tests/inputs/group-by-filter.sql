CREATE TEMPORARY VIEW f_orders AS SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`;
CREATE TEMPORARY VIEW f_lineitem AS SELECT * FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`;
CREATE TEMPORARY VIEW f_filtered_aggs AS SELECT o_orderstatus, count(*) FILTER (WHERE o_totalprice > 100000) AS big_orders, sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_total, avg(o_totalprice) AS avg_all FROM f_orders GROUP BY o_orderstatus;
CREATE TEMPORARY VIEW f_filter_no_group AS SELECT count(*) FILTER (WHERE o_orderstatus = 'F') AS finished, count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) AS big_customers FROM f_orders;
CREATE TEMPORARY VIEW f_filter_having AS SELECT o_custkey, count(*) FILTER (WHERE o_orderstatus = 'O') AS open_orders FROM f_orders GROUP BY o_custkey HAVING count(*) FILTER (WHERE o_orderstatus = 'O') > 1;
CREATE TEMPORARY VIEW f_mixed_distinct_filter AS SELECT l_returnflag, sum(l_quantity) FILTER (WHERE l_discount > 0.05) AS discounted_qty, count(DISTINCT l_suppkey) AS suppliers, max(l_extendedprice) AS max_price FROM f_lineitem GROUP BY l_returnflag;
CREATE TEMPORARY VIEW f_filter_join AS SELECT o.o_orderpriority, count(*) FILTER (WHERE l.l_shipdate > o.o_orderdate) AS late_lines FROM f_orders o JOIN f_lineitem l ON o.o_orderkey = l.l_orderkey GROUP BY o.o_orderpriority
