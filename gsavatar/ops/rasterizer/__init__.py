from .api import RasterizeConfig, rasterize, resolve_backend  # noqa: F401
