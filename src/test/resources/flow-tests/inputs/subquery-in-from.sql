CREATE TEMPORARY VIEW sf_orders AS SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`;
CREATE TEMPORARY VIEW sf_customer AS SELECT * FROM parquet.`/root/testdata/sf0.001/customer.parquet`;
CREATE TEMPORARY VIEW sf_aliased_as AS SELECT * FROM (SELECT o_orderkey, o_totalprice FROM sf_orders) AS t WHERE o_totalprice > 1000;
CREATE TEMPORARY VIEW sf_aliased_bare AS SELECT * FROM (SELECT o_orderkey, o_custkey FROM sf_orders WHERE o_orderstatus = 'F') t;
CREATE TEMPORARY VIEW sf_from_first AS FROM (SELECT o_custkey, o_totalprice FROM sf_orders WHERE o_totalprice > 500) t SELECT *;
CREATE TEMPORARY VIEW sf_unaliased AS SELECT * FROM (SELECT o_orderkey, o_orderdate FROM sf_orders) WHERE o_orderkey < 100;
CREATE TEMPORARY VIEW sf_nested AS SELECT o_custkey, total FROM (SELECT o_custkey, sum(o_totalprice) AS total FROM (SELECT * FROM sf_orders WHERE o_orderstatus <> 'X') inner_q GROUP BY o_custkey) outer_q WHERE total > 2000;
CREATE TEMPORARY VIEW sf_join_of_subqueries AS SELECT a.o_orderkey, b.c_name FROM (SELECT o_orderkey, o_custkey FROM sf_orders WHERE o_totalprice > 100) a JOIN (SELECT c_custkey, c_name FROM sf_customer) b ON a.o_custkey = b.c_custkey
