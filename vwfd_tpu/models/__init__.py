"""Training orchestrators — reference: models/*_model.py."""

from .state import NetState, adamw_chain, save_checkpoint, restore_checkpoint, latest_step
from .video_model import VideoWatermarkModel, VideoBatch
