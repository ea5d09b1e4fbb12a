from brevitas_tpu.interop.torch_import import (
    import_torch_state_dict,
    load_torch_checkpoint,
)

__all__ = ["import_torch_state_dict", "load_torch_checkpoint"]
