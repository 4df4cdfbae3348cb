from casapose_tpu.models.registry import Classifiers, get_model

__all__ = ["Classifiers", "get_model"]
