CREATE TEMPORARY VIEW ea_supplier AS SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet`;
CREATE TEMPORARY VIEW ea_lineitem AS SELECT * FROM parquet.`/root/testdata/sf0.001/lineitem.parquet`;
CREATE TEMPORARY VIEW ea_nation AS SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`;
CREATE TEMPORARY VIEW ea_having_exists AS SELECT s_suppkey, s_name FROM ea_supplier WHERE EXISTS (SELECT l_suppkey, sum(l_quantity) FROM ea_lineitem WHERE l_suppkey = s_suppkey GROUP BY l_suppkey HAVING sum(l_quantity) > 100);
CREATE TEMPORARY VIEW ea_not_exists_agg AS SELECT s_suppkey, s_acctbal FROM ea_supplier WHERE NOT EXISTS (SELECT l_suppkey, count(*) FROM ea_lineitem WHERE l_suppkey = s_suppkey GROUP BY l_suppkey HAVING count(*) > 50);
CREATE TEMPORARY VIEW ea_exists_global_agg AS SELECT s_suppkey FROM ea_supplier WHERE EXISTS (SELECT max(l_extendedprice) FROM ea_lineitem WHERE l_suppkey = s_suppkey);
CREATE TEMPORARY VIEW ea_exists_or_agg AS SELECT s_suppkey, s_nationkey FROM ea_supplier WHERE EXISTS (SELECT l_suppkey, avg(l_discount) FROM ea_lineitem WHERE l_suppkey = s_suppkey GROUP BY l_suppkey HAVING avg(l_discount) > 0.05) OR s_acctbal < 0;
CREATE TEMPORARY VIEW ea_agg_of_exists_agg AS SELECT n_regionkey, count(*) AS n_suppliers FROM ea_supplier JOIN ea_nation ON s_nationkey = n_nationkey WHERE EXISTS (SELECT l_suppkey, sum(l_tax) FROM ea_lineitem WHERE l_suppkey = s_suppkey GROUP BY l_suppkey HAVING sum(l_tax) > 1) GROUP BY n_regionkey
