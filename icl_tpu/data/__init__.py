from icl_tpu.data.sampler import TwoStreamBatchSampler, two_stream_batches
from icl_tpu.data.transforms import RandomGenerator, random_rot_flip, random_rotate
from icl_tpu.data.acdc import ACDCDataset

__all__ = [
    "TwoStreamBatchSampler",
    "two_stream_batches",
    "RandomGenerator",
    "random_rot_flip",
    "random_rotate",
    "ACDCDataset",
]
