"""Multi-chip sharding of the proving pipeline (mesh / shard_map layer).

The reference has no parallelism at all (SURVEY.md §2D: serial voter loops,
serial ciphertext aggregation, author-flagged unparallelized prover).  This
package introduces the axes as designed components:

  * data parallel over voters (ballot batch sharded on the `voters` axis);
  * MSM parallelism: CRS points partitioned across chips on the `points`
    axis, per-chip partial MSMs combined with an all-gather + local
    log-depth reduction (Jacobian addition is not a psum-able monoid);
  * tally reduction: ciphertext vectors aggregated across the voter axis.
"""
