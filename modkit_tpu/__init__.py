"""modkit_tpu: a TPU-native modified-base (methylation) analysis engine.

From-scratch JAX/XLA/Pallas re-design of the capabilities of
nanoporetech/modkit (the reference, a Rust CLI): modBAM -> bedMethyl pileup,
threshold estimation, modBAM rewriting, read-level extraction, DMR,
methylation entropy, motif tools, and bedMethyl utilities — with the numeric
kernels (threshold calling, per-position count aggregation, percentiles,
DMR likelihoods, entropy) on TPU and a from-scratch host I/O stack
(BGZF/BAM/BAI/FASTA/tabix) feeding fixed-shape device batches.
"""

__version__ = "0.1.0"
