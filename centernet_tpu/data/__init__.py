"""Data pipeline: transforms, sample encoders, COCO dataset, device loader."""

from .sample import (
    PaddedAnnotationSample,
    CenterDetectionSample,
    MultiPoseSample,
    encode_detection,
    encode_multi_pose,
    pad_annotations,
)
from .transforms import (
    AffineAugmenter,
    CategoryIdToClass,
    ComposeSample,
    Fliplr,
    Identity,
    ImageAugmentation,
    MultiSampleTransform,
    Normalize,
    PoseFlip,
    detection_train_augmenter,
    eval_augmenter,
    pose_train_augmenter,
    seed,
)

__all__ = [
    "PaddedAnnotationSample",
    "CenterDetectionSample",
    "MultiPoseSample",
    "encode_detection",
    "encode_multi_pose",
    "pad_annotations",
    "AffineAugmenter",
    "CategoryIdToClass",
    "ComposeSample",
    "Fliplr",
    "Identity",
    "ImageAugmentation",
    "MultiSampleTransform",
    "Normalize",
    "PoseFlip",
    "detection_train_augmenter",
    "eval_augmenter",
    "pose_train_augmenter",
    "seed",
]
