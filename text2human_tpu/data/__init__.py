from text2human_tpu.data.datasets import (
    DeepFashionAttrPoseDataset,
    DeepFashionAttrSegmDataset,
    MaskDataset,
    ParsingGenerationDataset,
    SyntheticDataset,
)
from text2human_tpu.data.loader import DataLoader
