from unet_implementations_tpu.serving.export import (
    ServingModel,
    export_forward,
    load_exported,
    save_exported,
)

__all__ = [
    "ServingModel",
    "export_forward",
    "load_exported",
    "save_exported",
]
