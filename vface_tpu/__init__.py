"""vface_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video face-swapping framework.

A ground-up rebuild of the capabilities of Sanoojan/VFace (REFace + FSAI/TSG/FGATS)
designed for TPU hardware:

* all compute-path code is pure-functional JAX traced under ``jit``;
* video frames are the batch dimension and shard across a ``jax.sharding.Mesh``;
* the plug-and-play attention "hooks" of the reference
  (``/root/reference/REFace/ldm/models/pnp_utils.py``) are first-class *functional*
  fusion configs threaded through the UNet forward instead of monkey-patches;
* DDIM sampling/inversion are ``lax.scan`` loops with the inversion latent stack
  kept in HBM (replacing the reference's per-step ``torch.save`` round trips,
  ``ldm/models/diffusion/ddim_w_inv.py:483,628``).

Package map
-----------
``vface_tpu.utils``      schedules, image math, tree/dtype helpers
``vface_tpu.ops``        fusion ops (FSAI), flow warps (FGATS), attention, Pallas kernels
``vface_tpu.models``     Flax modules: UNet, VAE, CLIP, ArcFace, BiSeNet, RAFT
``vface_tpu.samplers``   DDIM / DDIM-inversion / VFace 3-chunk sampler / PLMS
``vface_tpu.parallel``   mesh construction + sharding policies
``vface_tpu.pipelines``  image swap, video swap, test bench, training
``vface_tpu.preprocess`` alignment, parsing, masks, TPS
``vface_tpu.data``       datasets
``vface_tpu.eval``       FID / ID-retrieval / pose / expression / LPIPS
``vface_tpu.io``         video demux/mux
"""

__version__ = "0.1.0"
