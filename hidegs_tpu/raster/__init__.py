from hidegs_tpu.raster.api import RenderOutputs, render  # noqa: F401
