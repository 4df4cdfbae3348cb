from casapose_tpu.ops.connected_components import connected_components_labels, largest_component_mask
from casapose_tpu.ops.vectorfield import compute_vertex_vectorfield, get_all_vectorfields
from casapose_tpu.ops.voting import ls_voting

__all__ = [
    "connected_components_labels",
    "largest_component_mask",
    "compute_vertex_vectorfield",
    "get_all_vectorfields",
    "ls_voting",
]
