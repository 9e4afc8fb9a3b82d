"""Multi-chip scale-out: genome-tile sharding over a jax.sharding.Mesh.

The reference is single-node (rayon threads over genome intervals, monoid
reduce; SURVEY.md §2.5). The TPU-native equivalent shards genome tiles and
read batches over a device mesh and merges per-position count tensors with
psum collectives over ICI.
"""
