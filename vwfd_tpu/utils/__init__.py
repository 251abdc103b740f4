"""Console/logging/visualization utilities — reference: utils/__init__.py,
utils/util.py."""

from .progbar import Progbar
from .logging import setup_logger
from .images import stitch_images, tensor_to_uint8, save_image
from .telemetry import ScalarLogger, profile_trace, step_annotation
