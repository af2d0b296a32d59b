"""TPU-native serving runtime.

``continuous`` implements step-level continuous batching for diffusion
sampling — the scheduling layer above the reference's one-request-at-a-
time HTTP server (/root/reference/tools/inference_server.py:19-136).
"""

from .continuous import (
    AuraFlowSlotAdapter,
    CogView4SlotAdapter,
    ContinuousBatcher,
    FluxSlotAdapter,
    Lumina2SlotAdapter,
    SDXLSlotAdapter,
    SlotRequest,
)

__all__ = [
    "AuraFlowSlotAdapter",
    "CogView4SlotAdapter",
    "ContinuousBatcher",
    "FluxSlotAdapter",
    "Lumina2SlotAdapter",
    "SDXLSlotAdapter",
    "SlotRequest",
]
