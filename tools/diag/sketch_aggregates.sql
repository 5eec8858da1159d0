-- Diagnostic for the sketch_aggregates enforcing oracle: exact tier vs the
-- dumped sketch values, with the enforced bounds, side by side — so a bound
-- failure (rows mismatch 1 vs 0 at the gate) shows WHICH sketch drifted and
-- by how much instead of an opaque empty oracle result.
WITH ex AS (
  SELECT COUNT(DISTINCT l_partkey) AS parts,
    COUNT(DISTINCT l_suppkey) AS supps,
    quantile_cont(l_extendedprice, 0.49) AS med_lo,
    quantile_cont(l_extendedprice, 0.51) AS med_hi,
    quantile_cont(l_extendedprice, 0.98) AS p99_lo,
    quantile_cont(l_extendedprice, 1.00) AS p99_hi
  FROM lineitem)
SELECT 'parts' AS sketch, CAST(ex.parts AS DOUBLE) AS exact_lo,
  CAST(ex.parts AS DOUBLE) AS exact_hi, CAST(d.approx_parts AS DOUBLE) AS approx,
  d.approx_parts BETWEEN CAST(0.85 * ex.parts AS BIGINT)
                     AND CAST(1.15 * ex.parts AS BIGINT) AS in_bound
FROM read_parquet('{{OUT}}/sketch_aggregates/*.parquet') d, ex
UNION ALL
SELECT 'supps', CAST(ex.supps AS DOUBLE), CAST(ex.supps AS DOUBLE),
  CAST(d.approx_supps AS DOUBLE),
  d.approx_supps BETWEEN CAST(0.85 * ex.supps AS BIGINT)
                     AND CAST(1.15 * ex.supps AS BIGINT)
FROM read_parquet('{{OUT}}/sketch_aggregates/*.parquet') d, ex
UNION ALL
SELECT 'median_price', ex.med_lo, ex.med_hi, d.approx_median_price,
  d.approx_median_price BETWEEN ex.med_lo AND ex.med_hi
FROM read_parquet('{{OUT}}/sketch_aggregates/*.parquet') d, ex
UNION ALL
SELECT 'p99_price', ex.p99_lo, ex.p99_hi, d.approx_p99_price,
  d.approx_p99_price BETWEEN ex.p99_lo AND ex.p99_hi
FROM read_parquet('{{OUT}}/sketch_aggregates/*.parquet') d, ex
