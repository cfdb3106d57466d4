CREATE TEMPORARY VIEW e_customer AS SELECT * FROM parquet.`/root/testdata/sf0.001/customer.parquet`;
CREATE TEMPORARY VIEW e_orders AS SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`;
CREATE TEMPORARY VIEW e_nation AS SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`;
CREATE TEMPORARY VIEW e_uncorrelated AS SELECT c_custkey, c_name FROM e_customer WHERE EXISTS (SELECT 1 FROM e_orders WHERE o_totalprice > 400000);
CREATE TEMPORARY VIEW e_correlated AS SELECT c_custkey, c_acctbal FROM e_customer WHERE EXISTS (SELECT 1 FROM e_orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F');
CREATE TEMPORARY VIEW e_not_exists AS SELECT c_custkey FROM e_customer WHERE NOT EXISTS (SELECT 1 FROM e_orders WHERE o_custkey = c_custkey);
CREATE TEMPORARY VIEW e_exists_agg_sub AS SELECT c_custkey, c_mktsegment FROM e_customer WHERE EXISTS (SELECT o_custkey, sum(o_totalprice) AS spend FROM e_orders WHERE o_custkey = c_custkey GROUP BY o_custkey HAVING sum(o_totalprice) > 100000);
CREATE TEMPORARY VIEW e_agg_over_exists AS SELECT c_nationkey, count(*) AS active, avg(c_acctbal) AS bal FROM e_customer WHERE EXISTS (SELECT 1 FROM e_orders WHERE o_custkey = c_custkey) GROUP BY c_nationkey;
CREATE TEMPORARY VIEW e_exists_in_having AS SELECT c_nationkey, count(*) AS n FROM e_customer GROUP BY c_nationkey HAVING count(*) > 2 AND EXISTS (SELECT 1 FROM e_nation WHERE n_nationkey = c_nationkey AND n_regionkey = 1);
CREATE TEMPORARY VIEW e_exists_join AS SELECT c.c_custkey, n.n_name FROM e_customer c JOIN e_nation n ON c.c_nationkey = n.n_nationkey WHERE EXISTS (SELECT 1 FROM e_orders WHERE o_custkey = c.c_custkey AND o_orderpriority LIKE '1-%')
