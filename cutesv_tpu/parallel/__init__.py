"""Multi-chip sharding: genome-axis data parallelism over a jax Mesh."""
