"""TPU-native end-to-end multi-view feature matching with differentiable pose optimization.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
barbararoessle/e2e_multi_view_matching (ICCV 2023, arXiv 2205.01694):

- SuperPoint keypoint detection (frozen CNN) -> fixed-K static-shape outputs
- Multi-view attentional GNN matcher with log-domain Sinkhorn + confidence MLP
- Differentiable confidence-weighted eight-point relative pose (Gram/eigh based)
- Two-view Gauss-Newton/LM bundle adjustment with Schur complement
- Multi-view pose pipeline: rotation averaging (IRLS), translation averaging (LUD),
  and confidence-weighted Schur-complement LM bundle adjustment -- all in-process
  JAX, replacing the reference's Ceres/Theia C++ subprocesses
- pjit/shard_map data+model parallel training over a jax.sharding.Mesh

Layering (bottom-up): geom -> ops -> models/pose -> mvba -> data -> train/cli,
with `parallel` providing mesh/sharding utilities throughout.
"""

__version__ = "0.1.0"
