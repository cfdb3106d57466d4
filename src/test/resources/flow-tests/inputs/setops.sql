CREATE TEMPORARY VIEW g_customer AS SELECT * FROM parquet.`/root/testdata/sf0.001/customer.parquet`;
CREATE TEMPORARY VIEW g_supplier AS SELECT * FROM parquet.`/root/testdata/sf0.001/supplier.parquet`;
CREATE TEMPORARY VIEW g_union AS SELECT c_nationkey AS nk FROM g_customer UNION ALL SELECT s_nationkey AS nk FROM g_supplier;
CREATE TEMPORARY VIEW g_inter AS SELECT c_nationkey AS nk FROM g_customer INTERSECT SELECT s_nationkey AS nk FROM g_supplier;
CREATE TEMPORARY VIEW g_except AS SELECT c_nationkey AS nk FROM g_customer EXCEPT SELECT s_nationkey AS nk FROM g_supplier
