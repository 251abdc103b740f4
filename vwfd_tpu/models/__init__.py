"""Training orchestrators — reference: models/*_model.py."""

from .state import (NetState, adamw_chain, make_optimizer, apply_pretrain,
                    load_npz_tree, save_checkpoint, restore_checkpoint,
                    latest_step)
from .video_model import VideoWatermarkModel, VideoBatch
from .image_model import ImageImmunizationModel, ImageBatch
from .hidden_model import HiddenModel
from .mbrs_model import MBRSModel
from .kdjpeg_model import KDJpegModel
from .tianchi_model import TianchiModel
