"""neosr_tpu — a TPU-native super-resolution training framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the capabilities of
muslll/neosr (the reference lives at /root/reference, studied not copied):
same TOML config surface and train/test/convert entry points, re-architected
for TPUs — NHWC layout, jitted functional train steps, mesh-sharded data
parallelism over ICI, fused device-side degradations, and Pallas kernels for
the hot window-attention ops.
"""

__version__ = "0.1.0"
