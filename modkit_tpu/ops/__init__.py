"""Device (JAX/XLA/Pallas) kernels for the modified-base engine."""
