-- Diagnostic for the nonnegativity-ENFORCING oracle (empty result when any
-- factor value is negative): surface the minimum, the offending count, and
-- the worst rows instead of an opaque rows mismatch.
WITH f AS (SELECT * FROM read_parquet('{{OUT}}/als_nonnegative_factors/*.parquet'))
SELECT (SELECT MIN(value) FROM f) AS min_value,
  (SELECT COUNT(*) FROM f WHERE value < 0) AS negative_cells,
  (SELECT COUNT(*) FROM f) AS total_cells
