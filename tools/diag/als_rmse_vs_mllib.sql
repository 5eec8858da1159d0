-- Diagnostic for the RMSE parity floor: the oracle returns zero rows when
-- graft_rmse > mllib_rmse * 1.05 + 1e-9, which the gate reports only as a
-- rows mismatch. Show both values and the bound so a parity regression is
-- readable from the gate output.
SELECT graft_rmse, mllib_rmse,
  mllib_rmse * 1.05 + 1e-9 AS floor_bound,
  graft_rmse <= mllib_rmse * 1.05 + 1e-9 AS within_floor_recomputed,
  within_floor AS within_floor_dumped
FROM read_parquet('{{OUT}}/als_rmse_vs_mllib/*.parquet')
