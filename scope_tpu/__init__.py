"""scope_tpu: TPU-native long-context inference with SCOPE-style
prefill+decode KV-cache compression (JAX/XLA/Pallas)."""

__version__ = "0.1.0"

from scope_tpu.config import (CompressionConfig, EngineConfig, ModelSpec,
                              derive_delta)
