from .model import DetectionModel, load_model, make_divisible
from .registry import REGISTRY

__all__ = ["DetectionModel", "load_model", "make_divisible", "REGISTRY"]
