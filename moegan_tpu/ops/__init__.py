from moegan_tpu.ops.grid_sample import bilinear_grid_sample

__all__ = ["bilinear_grid_sample"]
