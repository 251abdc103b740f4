"""Host-side data pipeline feeding device batches — reference: data/.

All decoding/augmentation runs on CPU in numpy/cv2 (the right split on TPU:
the chip only ever sees fixed-shape NHWC float batches); stroke masks and
canny maps are precomputed host-side, never inside the jitted step
(SURVEY.md §3 flags the reference's mid-step CPU round trips as a perf sink).
"""

from .synthetic import SyntheticVideoDataset, SyntheticImageDataset
from .davis import DavisVideoDataset
from .images import ImageFolderDataset
from .masks import free_form_stroke_mask, random_rect_mask
from .loader import Loader
from .jpeg_data import LQJpegDataset, DCTDomainDataset, blockwise_dct_np
