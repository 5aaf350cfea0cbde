from .torch_convert import (
    convert_checkpoint,
    convert_dgcnn_state_dict,
    convert_flow_state_dict,
    convert_paconv_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "convert_checkpoint", "convert_dgcnn_state_dict",
    "convert_flow_state_dict", "convert_paconv_state_dict",
    "load_torch_checkpoint",
]
