"""Expression metric: 3DMM expression-coefficient L2 vs the target face.

Capability parity with `/root/reference/REFace/eval_tool/Expression/
expression_compare_face_recon.py` (:196-197, :381) using Deep3DFaceRecon's
``net_recon`` (`eval_tool/Deep3DFaceRecon_pytorch_edit/models/networks.py`):
a ResNet-50 regressing the 257-d BFM09 coefficient vector; the metric is the
L2 distance between the expression slices ``coeff[80:144]`` of swapped and
target crops. The nvdiffrast renderer of the reference is eval-only and not
needed for this metric (SURVEY §2.9) — only the coefficient regressor is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vface_tpu.eval.backbones import ResNet50

# BFM09 coefficient layout (facerecon_model.py split_coeff)
ID_SLICE = slice(0, 80)
EXP_SLICE = slice(80, 144)
TEX_SLICE = slice(144, 224)
ANGLE_SLICE = slice(224, 227)
GAMMA_SLICE = slice(227, 254)
TRANS_SLICE = slice(254, 257)


class FaceReconNet(nn.Module):
    """ResNet-50 → 257 BFM coefficients (networks.py ReconNetWrapper)."""

    coeffs: int = 257

    @nn.compact
    def __call__(self, x):
        feat = ResNet50(name="backbone")(x)
        return nn.Dense(self.coeffs, param_dtype=jnp.float32, name="fc")(feat)


def face_coeffs(params, images01, model: FaceReconNet | None = None) -> jax.Array:
    """[0,1] face crops → (B, 257) coefficients (224² input, [0,1] RGB —
    Deep3DFaceRecon's convention)."""
    model = model or FaceReconNet()
    b = images01.shape[0]
    x = jax.image.resize(jnp.asarray(images01), (b, 224, 224, 3), method="bilinear")
    return model.apply({"params": params}, x)


def expression_l2(coeffs_a: np.ndarray, coeffs_b: np.ndarray) -> float:
    ea = np.asarray(coeffs_a)[:, EXP_SLICE]
    eb = np.asarray(coeffs_b)[:, EXP_SLICE]
    return float(np.linalg.norm(ea - eb, axis=-1).mean())
