-- Diagnostic for the drift meter: the gate compares the full row hash, so a
-- retrain_recommended flip or a recall drift shows only as a hash mismatch.
-- Print the dumped row with the margin the decision rule uses (0.02,
-- Queries.retrainGainMargin).
SELECT n_exact_pairs, stale_recall, fresh_recall, retrain_gain,
  retrain_recommended,
  retrain_gain > 0.02 AS recommended_recomputed
FROM read_parquet('{{OUT}}/sim_drift_recall/*.parquet')
