from dogs_tpu.raster.binning import TileBins, bins_membership, build_tile_bins
from dogs_tpu.raster.projection import ProjectedGaussians, project_gaussians
from dogs_tpu.raster.reference import RenderOutput, render_reference
from dogs_tpu.raster.ssim import dssim_loss, ssim, ssim_map
from dogs_tpu.raster.tiled import RasterConfig, render_tiled
