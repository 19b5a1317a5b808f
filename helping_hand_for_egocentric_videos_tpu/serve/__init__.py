"""TPU-idiomatic serving for the dual encoder.

The reference repo stops at offline eval scripts; production serving on
TPU needs two things XLA imposes: STATIC shapes (every distinct batch
size is a fresh compile) and batched device calls (per-request dispatch
wastes the chip). `ServingEngine` provides both — power-of-two batch
bucketing with masked padding and a cross-request micro-batcher — and
`serve.server` exposes it over plain HTTP with zero extra dependencies.
"""

from .engine import ServeConfig, ServingEngine

__all__ = ["ServeConfig", "ServingEngine"]
