"""On-device sparse optical flow.

Replaces the reference's OpenCV-backed ``optical_flow`` submodule
(``lucas_kanade(img0, img1, out_dir, save, verbose, save_name) ->
{"vectors": [[x, y, dx, dy], ...]}``, generate_illusion.py:549-554) with a
batched JAX implementation: Shi-Tomasi corner detection + iterative
pyramidal Lucas-Kanade, all fixed-K masked tensors so the whole population's
flow extraction stays in one jitted device program.
"""

from .api import FlowConfig, batched_flow, flow_vectors, lucas_kanade
from .corners import shi_tomasi_corners
from .lk import pyramid_lk
from .pyramid import build_pyramid, to_gray

__all__ = [
    "FlowConfig",
    "batched_flow",
    "flow_vectors",
    "lucas_kanade",
    "shi_tomasi_corners",
    "pyramid_lk",
    "build_pyramid",
    "to_gray",
]
