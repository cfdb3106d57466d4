CREATE TEMPORARY VIEW g_nation AS SELECT * FROM parquet.`/root/testdata/sf0.001/nation.parquet`;
CREATE TEMPORARY VIEW g_region AS SELECT * FROM parquet.`/root/testdata/sf0.001/region.parquet`;
CREATE TEMPORARY VIEW g_supplier AS SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet`;
CREATE TEMPORARY VIEW g_joined AS SELECT n_name, r_name FROM g_nation JOIN g_region ON n_regionkey = r_regionkey;
CREATE TEMPORARY VIEW g_semi AS SELECT n_nationkey, n_name FROM g_nation WHERE n_nationkey IN (SELECT s_nationkey FROM g_supplier);
CREATE TEMPORARY VIEW g_anti AS SELECT n_nationkey FROM g_nation WHERE NOT EXISTS (SELECT 1 FROM g_supplier WHERE s_nationkey = n_nationkey)
