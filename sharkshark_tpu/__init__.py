"""sharkshark_tpu — TPU-native real-time video super-resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
gmlwns2000/sharkshark-4k (live-stream upscaling + denoising + restreaming,
an image-upscale HTTP service, and a VSR training tree), designed for TPU:

- model cores are pure functional pytrees compiled with `jax.jit` (bf16 on
  the MXU), replacing the reference's TensorRT engines
  (reference: src/upscale/model/*/factory.py);
- temporal state (BSVD shift buffers, EGVSR frame recurrence) is carried
  explicitly through `lax.scan`, replacing stateful nn.Module buffers;
- the stage pipeline is host threads + bounded queues around a persistent
  jitted device step, replacing torch.multiprocessing + CUDA shared memory
  (reference: src/upscale/base_service.py, src/sharkshark/pipeline.py);
- multi-chip scaling is `jax.sharding.Mesh` + ICI collectives
  (batch data-parallel and spatial halo sharding), not NCCL.
"""

__version__ = "0.1.0"
