from .update_r_fused import fused_update_r, pallas_geometry

__all__ = ["fused_update_r", "pallas_geometry"]
