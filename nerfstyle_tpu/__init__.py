"""nerfstyle_tpu — a TPU-native framework for locally stylized neural radiance fields.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of hkust-vgd/nerfstyle
("Locally Stylized Neural Radiance Fields", arXiv 2309.10684). The reference is a
single-GPU CUDA/torch research codebase; this framework re-designs every component
TPU-first:

  * instant-ngp multiresolution hash encoding  -> batched gather + trilerp with a
    custom VJP (``ops/hashgrid.py``), Pallas kernels for the hot paths.
  * tiny-cuda-nn fused MLPs                    -> bf16 MXU matmul stacks (``ops/mlp.py``).
  * CUDA occupancy-grid ray marcher            -> fully vectorized lattice march with
    static-shape compaction (``ops/marching.py``); the reference marches with
    dt_gamma=0, i.e. a *uniform* t-lattice, so the whole march is expressible as
    dense masked tensor ops instead of per-ray loops.
  * CUDA alpha compositor (fwd+hand bwd)       -> segment-scan compositor relying on
    JAX autodiff (``ops/compositing.py``).
  * single-GPU only                            -> ``jax.sharding.Mesh`` data-parallel
    ray/point/cell sharding (``parallel/``).

Layer map mirrors the reference (see SURVEY.md section 1): CLI -> Config -> Trainer ->
Renderer -> Model -> ops/kernels, with Data feeding the trainer.
"""

__version__ = "0.1.0"
