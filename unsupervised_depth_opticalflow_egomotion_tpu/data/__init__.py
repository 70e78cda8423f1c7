"""Host-side data preparation and input pipeline."""

from .kitti_flow import KittiFlowEval
from .kitti_pose import KittiPoseEval
from .kitti_prep import KittiOdoPrep, KittiRawPrep
from .nyu import NyuPrep, load_nyu_test_data, test_nyu_depth
from .loader import (
    BatchLoader,
    KittiPreparedDataset,
    multiscale_intrinsics,
    read_cam_intrinsic,
    rescale_intrinsics,
)
from .native_loader import NativeBatchLoader, make_loader

__all__ = [
    "KittiFlowEval",
    "KittiPoseEval",
    "KittiOdoPrep",
    "KittiRawPrep",
    "NyuPrep",
    "load_nyu_test_data",
    "test_nyu_depth",
    "BatchLoader",
    "NativeBatchLoader",
    "make_loader",
    "KittiPreparedDataset",
    "multiscale_intrinsics",
    "read_cam_intrinsic",
    "rescale_intrinsics",
]
