CREATE TEMPORARY VIEW ia_part AS SELECT * FROM parquet.`/root/testdata/sf0.001/part.parquet`;
CREATE TEMPORARY VIEW ia_lineitem AS SELECT * FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`;
CREATE TEMPORARY VIEW ia_orders AS SELECT * FROM parquet.`/root/testdata/sf0.001/orders.parquet`;
CREATE TEMPORARY VIEW ia_in_grouped_agg AS SELECT p_partkey, p_name FROM ia_part WHERE p_partkey IN (SELECT max(l_partkey) FROM ia_lineitem GROUP BY l_orderkey);
CREATE TEMPORARY VIEW ia_not_in_agg AS SELECT o_orderkey, o_totalprice FROM ia_orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM ia_lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150);
CREATE TEMPORARY VIEW ia_in_having AS SELECT l_suppkey, sum(l_extendedprice) AS revenue FROM ia_lineitem GROUP BY l_suppkey HAVING l_suppkey IN (SELECT min(l_suppkey) FROM ia_lineitem GROUP BY l_partkey);
CREATE TEMPORARY VIEW ia_corr_in_agg AS SELECT o_orderkey FROM ia_orders WHERE o_orderkey IN (SELECT l_orderkey FROM ia_lineitem WHERE l_shipdate < o_orderdate GROUP BY l_orderkey HAVING count(*) >= 2);
CREATE TEMPORARY VIEW ia_agg_over_in_agg AS SELECT p_brand, count(*) AS n, max(p_retailprice) AS top_price FROM ia_part WHERE p_partkey IN (SELECT max(l_partkey) FROM ia_lineitem GROUP BY l_suppkey) GROUP BY p_brand
