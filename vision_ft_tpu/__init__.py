"""vision-ft-tpu: TPU-native image-diffusion fine-tuning & inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
p1atdev/vision-ft (PyTorch/CUDA). Design stance:

- Functional core: models are pure ``apply(params, ...)`` functions over
  nested param dicts whose flattened keys match the reference torch
  state-dict layout (safetensors interop is a dict flatten/unflatten).
- SPMD: parallelism via ``jax.sharding.Mesh`` + NamedSharding, not NCCL.
- Hot kernels (flash attention, NF4 dequant-matmul) in Pallas.
"""

__version__ = "0.1.0"
