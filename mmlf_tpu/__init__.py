"""mmlf_tpu — TPU-native multimodal light-field depth estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
titus-leistner/mmlf ("Towards Multimodal Depth Estimation from Light Fields",
CVPR 2022).  The compute path is idiomatic JAX (jit/vmap/scan/pjit over a
device mesh); nothing is a translation of the reference's PyTorch code.

Conventions (differ deliberately from the torch reference):
  * image-like arrays are channel-last: view stacks ``(n, H, W, 3)``,
    center ``(H, W, 3)``, MPI ``(K, H, W, 5)`` (5 = RGB, alpha, disparity)
    — NHWC is the native XLA/TPU layout (reference: NCHW,
    /root/reference/mmlf/data/hci4d.py:160).
  * all random augmentation parameters are sampled on the host and applied
    on-device inside the jitted train step.
  * disparity posteriors are ``(..., H, W, S)`` internally and transposed to
    the reference's ``(S, H, W)`` only when writing artifacts.
"""

__version__ = "0.1.0"
