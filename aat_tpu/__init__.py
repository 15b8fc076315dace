"""aat_tpu — TPU-native audio adaptive tokenizer + audio-speech LM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mrsndmn/audio-adaptive-tokenizer (reference mounted at /root/reference):

- adaptive amplitude segmentation of 16 kHz speech (ref: src/aat/tokenizer.py)
- mel-spectrogram frontend as a GEMM-native DFT (ref: get_melspec,
  src/aat/tokenizer.py:107-119) running on the MXU
- HuBERT / wav2vec2 segment encoders as pure-JAX modules
- ASLM (audio-speech LM): segment projection into a Llama-family decoder
  (ref: src/aslm/modeling_aslm.py)
- pjit/shard_map training stack over a jax.sharding.Mesh

Import layout:
    aat_tpu.audio          waveform value types
    aat_tpu.tokenizer      AdaptiveAudioTokenizer (host-exact + on-device paths)
    aat_tpu.ops            Pallas/XLA kernels (mel, segmentation, ragged, attention, vq)
    aat_tpu.models         hubert / llama / aslm / efficientnet
    aat_tpu.data           collators, dataloaders, datasets
    aat_tpu.training       config, optimizers, schedules, trainer, metrics, generation
    aat_tpu.parallel       mesh + sharding rules, sequence/pipeline parallelism
    aat_tpu.utils          timing, logging, torch-checkpoint porting
"""

__version__ = "0.1.0"
