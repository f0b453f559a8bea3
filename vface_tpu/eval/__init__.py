"""Evaluation harness — ports of eval_tool/ (SURVEY §2.8).

FID, ID retrieval (top-1/top-5/cosine), pose L2 (Hopenet), expression L2
(Deep3DFaceRecon coeffs), LPIPS. `vface_tpu.eval.harness.evaluate_all`
mirrors evaluate_all.sh.
"""

from vface_tpu.eval.expression import FaceReconNet, expression_l2, face_coeffs
from vface_tpu.eval.fid import InceptionV3Pool3, compute_fid, frechet_distance
from vface_tpu.eval.id_retrieval import embed_faces, id_retrieval
from vface_tpu.eval.lpips import LPIPS, make_lpips_fn
from vface_tpu.eval.pose import Hopenet, head_pose, pose_l2

__all__ = [
    "FaceReconNet",
    "expression_l2",
    "face_coeffs",
    "InceptionV3Pool3",
    "compute_fid",
    "frechet_distance",
    "embed_faces",
    "id_retrieval",
    "LPIPS",
    "make_lpips_fn",
    "Hopenet",
    "head_pose",
    "pose_l2",
]
