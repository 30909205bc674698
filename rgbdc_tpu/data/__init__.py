from .datasets import (
    BaseDataset,
    NYUv2Dataset,
    SUNRGBDDataset,
    ImageFolder,
    ImageFolderUnited,
    SyntheticRGBD,
    DataLoader,
    make_train_dataset,
)

__all__ = [
    "BaseDataset",
    "NYUv2Dataset",
    "SUNRGBDDataset",
    "ImageFolder",
    "ImageFolderUnited",
    "SyntheticRGBD",
    "DataLoader",
    "make_train_dataset",
]
