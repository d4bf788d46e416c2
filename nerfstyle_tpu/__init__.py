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

# Honor JAX_PLATFORMS even under PJRT plugins that ignore the env var: some
# plugin backends (e.g. the remote-TPU tunnel in this environment) initialize
# eagerly and can block indefinitely on an unreachable device even when the
# user asked for a different platform.  Mirroring the env var into jax.config
# before any backend initializes restores the documented env-var semantics
# for every CLI/tool that imports this package.  No-op when unset.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - config may already be frozen
        pass
