from biggan_tpu.sampling.truncation import sample_z  # noqa: F401
from biggan_tpu.sampling.grids import merge_grid, save_image_grid  # noqa: F401
