from msau_tpu.ops.morphology import r_closing, r_dilation, r_erosion, r_opening
from msau_tpu.ops.ccl import connected_components_jax

__all__ = [
    "r_dilation",
    "r_erosion",
    "r_opening",
    "r_closing",
    "connected_components_jax",
]
