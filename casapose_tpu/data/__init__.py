from casapose_tpu.data.image_only import ImageOnlyDataset
from casapose_tpu.data.ndds import VectorfieldDataset

__all__ = ["ImageOnlyDataset", "VectorfieldDataset"]
