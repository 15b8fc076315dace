"""Serving layer: continuous-batching decode engine for the ASLM.

The reference has no serving path (SURVEY §1: "no serving/inference-server
layer"); this is a TPU-native addition — static-shape KV-cache slots,
per-row decode offsets, one fused dispatch advancing every active request.
"""

from aat_tpu.serving.engine import DecodeEngine, EngineConfig, encode_speech_request

__all__ = ["DecodeEngine", "EngineConfig", "encode_speech_request"]
