-- Diagnostic for the implicit-MPR parity floor (zero oracle rows when
-- graft_mpr > mllib_mpr * 1.05 + 0.02 or the random bracket drifts).
SELECT graft_mpr, mllib_mpr, ideal_mpr, random_mpr,
  mllib_mpr * 1.05 + 0.02 AS floor_bound,
  graft_mpr <= mllib_mpr * 1.05 + 0.02 AS within_floor_recomputed,
  within_floor AS within_floor_dumped,
  random_mpr = 0.5 AS random_bracket_ok
FROM read_parquet('{{OUT}}/als_implicit_vs_mllib/*.parquet')
