"""Device-mesh scaling: dp over scan pairs, tp over the descriptor database.

The reference is single-process OpenMP (SURVEY.md section 2.12); the TPU
equivalents are jax.sharding Mesh + shard_map with XLA collectives.
"""
