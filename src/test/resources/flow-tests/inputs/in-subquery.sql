CREATE TEMPORARY VIEW i_part AS SELECT * FROM parquet.`/root/testdata/sf0.001/part.parquet`;
CREATE TEMPORARY VIEW i_supplier AS SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet`;
CREATE TEMPORARY VIEW i_nation AS SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`;
CREATE TEMPORARY VIEW i_in_simple AS SELECT p_partkey, p_name FROM i_part WHERE p_size IN (1, 5, 9);
CREATE TEMPORARY VIEW i_in_sub AS SELECT p_partkey, p_brand FROM i_part WHERE p_size IN (SELECT n_nationkey FROM i_nation WHERE n_regionkey = 2);
CREATE TEMPORARY VIEW i_not_in_sub AS SELECT s_suppkey, s_name FROM i_supplier WHERE s_nationkey NOT IN (SELECT n_nationkey FROM i_nation WHERE n_regionkey = 0);
CREATE TEMPORARY VIEW i_in_agg_sub AS SELECT p_partkey, p_retailprice FROM i_part WHERE p_size IN (SELECT max(p_size) FROM i_part GROUP BY p_type);
CREATE TEMPORARY VIEW i_correlated_in AS SELECT s_suppkey, s_acctbal FROM i_supplier WHERE s_nationkey IN (SELECT n_nationkey FROM i_nation WHERE n_name > s_name);
CREATE TEMPORARY VIEW i_agg_over_in AS SELECT p_brand, count(*) AS n, avg(p_retailprice) AS avg_price FROM i_part WHERE p_type IN (SELECT DISTINCT p_type FROM i_part WHERE p_size > 40) GROUP BY p_brand;
CREATE TEMPORARY VIEW i_in_and_exists AS SELECT p_partkey FROM i_part WHERE p_size IN (SELECT n_nationkey FROM i_nation) AND EXISTS (SELECT 1 FROM i_supplier WHERE s_suppkey = p_partkey)
