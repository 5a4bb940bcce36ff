from thinktwice_tpu.ops.voxel_pool import voxel_pool
from thinktwice_tpu.ops.grid_sample import grid_sample_2d
from thinktwice_tpu.ops.deform_attn import ms_deform_attn

__all__ = ["voxel_pool", "grid_sample_2d", "ms_deform_attn"]
