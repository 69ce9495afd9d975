"""Data pipelines: image folders (ADM), COCO captions (SD)."""

from .coco import CocoCaptions, coco_image_batches, load_captions
from .images import ImageDataset, list_image_files_recursively, load_data

__all__ = ["CocoCaptions", "coco_image_batches", "load_captions",
           "ImageDataset", "list_image_files_recursively", "load_data"]
