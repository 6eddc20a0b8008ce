"""vgqa_tpu — TPU-native video grounding + video question answering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``dodoseung/video-grounding-question-answering`` reference (PyTorch/CUDA):

* Spatio-temporal video grounding (STVG): DETR-style dual-decoder model over
  ResNet-101 + Video Swin-T + RoBERTa features, trained on VidSTG.
* Video question answering: InternVL-style multimodal LLM served with a
  batched TPU prefill+decode engine.

Compute is expressed as functional JAX (flax.linen modules, static shapes,
masked ops instead of data-dependent gathers) and runs under ``jit``/``pjit``
over a ``jax.sharding.Mesh``; the runtime around it (video decode, data
loading) uses native C++ where the reference relied on native libraries.
"""

__version__ = "0.1.0"
