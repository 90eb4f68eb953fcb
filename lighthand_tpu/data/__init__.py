from lighthand_tpu.data.registry import build_dataset
from lighthand_tpu.data.pipeline import Loader, DevicePreprocessor

__all__ = ["build_dataset", "Loader", "DevicePreprocessor"]
