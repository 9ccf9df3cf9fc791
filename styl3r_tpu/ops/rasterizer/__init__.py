from .camera import RasterCamera, make_raster_camera
from .project import project_gaussians
from .render import render, RenderOutput

__all__ = [
    "RasterCamera",
    "make_raster_camera",
    "project_gaussians",
    "render",
    "RenderOutput",
]
