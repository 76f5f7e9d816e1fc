from .camera import Camera  # noqa: F401
from . import graphics  # noqa: F401
