from . import loss, matmul_scoring  # noqa: F401

# pallas_rank imports jax.experimental.pallas lazily via eval/test paths;
# import here too for discoverability (safe on CPU — kernels only compile
# when invoked).
from . import pallas_rank  # noqa: F401
