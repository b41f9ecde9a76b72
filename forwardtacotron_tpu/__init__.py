"""ForwardTacotron-TPU: a TPU-native (JAX/XLA/Pallas) feed-forward TTS framework.

A from-scratch re-design of the capabilities of ziyaad30/ForwardTacotron
(non-autoregressive FastSpeech-style TTS with a Tacotron duration teacher)
for TPU hardware: batch-first channels-last tensors, `lax.scan` RNNs,
MXU-friendly length regulation, pjit/mesh data parallelism, and Pallas
kernels for the hot ops.
"""

__version__ = "0.1.0"
