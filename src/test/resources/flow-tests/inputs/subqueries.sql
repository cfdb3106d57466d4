CREATE TEMPORARY VIEW g_part AS SELECT * FROM parquet.`/root/testdata/sf0.001/part.parquet`;
CREATE TEMPORARY VIEW g_from_sub AS SELECT brand, n FROM (SELECT p_brand AS brand, count(*) AS n FROM g_part GROUP BY p_brand) t WHERE n > 10;
CREATE TEMPORARY VIEW g_scalar_pred AS SELECT p_partkey, p_retailprice FROM g_part WHERE p_retailprice > (SELECT 0.95 * max(p_retailprice) FROM g_part);
CREATE TEMPORARY VIEW g_in_sub AS SELECT p_partkey FROM g_part WHERE p_size IN (SELECT max(p_size) FROM g_part GROUP BY p_brand)
