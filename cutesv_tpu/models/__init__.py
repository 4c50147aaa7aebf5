"""Per-SV-type resolvers.

``host``   — exact scalar/numpy engine (behavioral oracle, always available)
``device`` — JAX/TPU engine built on cutesv_tpu.ops (sort/segment kernels)
"""
