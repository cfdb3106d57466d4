CREATE TEMPORARY VIEW sq_customer AS SELECT * FROM parquet.`/root/testdata/sf0.001/customer.parquet`;
CREATE TEMPORARY VIEW sq_orders AS SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`;
CREATE TEMPORARY VIEW sq_nation AS SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`;
CREATE TEMPORARY VIEW sq_select_uncorr AS SELECT c_custkey, c_acctbal, (SELECT avg(o_totalprice) FROM sq_orders) AS global_avg FROM sq_customer;
CREATE TEMPORARY VIEW sq_select_corr AS SELECT c_custkey, c_name, (SELECT count(*) FROM sq_orders WHERE o_custkey = c_custkey) AS n_orders FROM sq_customer;
CREATE TEMPORARY VIEW sq_select_two AS SELECT c_custkey, (SELECT max(o_totalprice) FROM sq_orders WHERE o_custkey = c_custkey) AS max_spend, (SELECT min(n_name) FROM sq_nation WHERE n_nationkey = c_nationkey) AS nation_name FROM sq_customer;
CREATE TEMPORARY VIEW sq_in_aggregate AS SELECT c_nationkey, sum(c_acctbal + (SELECT avg(o_totalprice) FROM sq_orders)) AS adj_bal FROM sq_customer GROUP BY c_nationkey;
CREATE TEMPORARY VIEW sq_over_join AS SELECT c.c_custkey, n.n_name, (SELECT sum(o_totalprice) FROM sq_orders WHERE o_custkey = c.c_custkey) AS spend FROM sq_customer c JOIN sq_nation n ON c.c_nationkey = n.n_nationkey;
CREATE TEMPORARY VIEW sq_nested AS SELECT c_custkey, (SELECT max(o_totalprice) FROM sq_orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM sq_orders)) AS top_above_avg FROM sq_customer
