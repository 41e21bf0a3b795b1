"""Multi-request serving: continuous batching over a slot-based KV cache.

Beyond-reference subsystem (the reference serves one request at a time
through ``Magma.generate``, magma/sampling.py:43-121): a production
engine that keeps one resident batched KV cache on device and interleaves
prefill/decode across concurrently running requests.
"""

from magma_tpu.serving.engine import (  # noqa: F401
    FinishedRequest,
    LMServingEngine,
    MagmaServingEngine,
)
