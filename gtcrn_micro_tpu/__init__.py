"""GTCRN-Micro-TPU: a TPU-native speech-enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
GTCRN-Micro reference (speech enhancement, 16 kHz, ~19k params):

- ``dsp``     -- jittable STFT/iSTFT + ERB filterbank frontend
- ``nn``      -- functional layer system with a single graph definition
                 that serves offline, streaming, training and quantized paths
- ``models``  -- the GTCRN-Micro model family
- ``train``   -- data-parallel training stack (loss, scheduler, loader, trainer)
- ``eval``    -- enhancement + intrusive/non-intrusive metric harness
- ``quant``   -- int8 PTQ/QAT path (TPU-native serving)
- ``parallel``-- mesh / sharding helpers (ICI data parallelism, stream batching)
- ``runtime`` -- native (C++) host runtime pieces

Design stance: the model is a pure function over a params pytree; streaming is
``(state, frame) -> (state, frame)`` closed over params, run under
``jax.lax.scan`` over time and batched over streams; training is a jit-compiled
update step sharded over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
