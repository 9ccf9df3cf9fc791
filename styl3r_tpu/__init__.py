"""styl3r_tpu — a TPU-native (JAX/XLA/Pallas) feed-forward 3D stylization framework.

Re-implements the capabilities of Styl3R (NeurIPS 2025, arXiv 2505.21060): given
2-4 unposed sparse-view images of a scene plus one style image, predict a set of
stylized 3D Gaussians in a single feed-forward pass and render novel views with a
differentiable tile-based Gaussian splatting rasterizer.

Design notes (TPU-first, not a port):
  * The whole encoder (CroCo ViT-L + multiview decoder + token stylizer + DPT heads
    + Gaussian adapter) is one jittable function over pytrees of parameters.
  * RoPE2D is a fused jnp transform (the reference needs a CUDA kernel only because
    of eager-mode overhead; XLA fuses it into the attention matmuls).
  * The rasterizer is a Pallas tile kernel (16x16 pixel tiles, tile-binned and
    depth-sorted gaussians, front-to-back alpha compositing) with a pure-JAX
    reference implementation used for testing and as autodiff fallback.
  * Multi-device scaling is a jax.sharding Mesh + jit data-parallel training step;
    XLA inserts the gradient all-reduce over ICI.
"""

__version__ = "0.1.0"
