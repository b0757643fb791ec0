"""Encoder configuration, mirroring the reference Encoder.Config
(libFLAC/Encoder.zig:423-481).

``channels`` semantics match the reference's ``Stereo`` enum: an int 1..8
means that many independent channels; the string ``"stereo_auto"`` (the
default for 2-channel input) enables automatic stereo decorrelation mode
selection per frame (L/R vs L/S vs S/R vs M/S).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal, Union

MAX_RICE_PARAM_4BIT = 14
MAX_RICE_PARAM_5BIT = 30
MAX_RICE_PARAM = MAX_RICE_PARAM_5BIT
ESC_PARTITION = 31
MAX_RICE_ORDER = 8  # subset limit, reference rice.zig:11
MAX_FIXED_ORDER = 4

Prediction = Literal["fixed", "none", "lpc"]
Channels = Union[int, Literal["stereo_auto"]]


@dataclass(frozen=True)
class EncoderConfig:
    block_size: int = 4096
    prediction: Prediction = "fixed"
    channels: Channels = "stereo_auto"
    max_rice_order: int = MAX_RICE_ORDER
    max_rice_param: int = MAX_RICE_PARAM
    # --- extensions beyond the reference (it stubs LPC: Encoder.zig:498-503) ---
    lpc_order: int = 8            # max LPC order when prediction == "lpc"
    lpc_precision: int = 14       # quantized coefficient precision bits
    wasted_bits: bool = False     # detect/shave common trailing zero bits

    @property
    def num_channels(self) -> int:
        return 2 if self.channels == "stereo_auto" else int(self.channels)

    @property
    def stereo_auto(self) -> bool:
        return self.channels == "stereo_auto"

    @staticmethod
    def default(channels: int) -> "EncoderConfig":
        """Reference Config.default (libFLAC/Encoder.zig:472-480)."""
        return EncoderConfig(
            block_size=4096,
            prediction="fixed",
            channels="stereo_auto" if channels == 2 else channels,
            max_rice_order=MAX_RICE_ORDER,
            max_rice_param=MAX_RICE_PARAM,
        )

    def __post_init__(self) -> None:
        if not (1 <= self.block_size <= 65535):
            raise ValueError(f"block_size out of range: {self.block_size}")
        if self.channels != "stereo_auto" and not (1 <= int(self.channels) <= 8):
            raise ValueError(f"channels out of range: {self.channels}")
        if not (0 <= self.max_rice_order <= 15):
            raise ValueError(f"max_rice_order out of range: {self.max_rice_order}")
        if self.max_rice_param not in (MAX_RICE_PARAM_4BIT, MAX_RICE_PARAM_5BIT):
            # The reference asserts exactly these two values
            # (libFLAC/rice.zig:345); other values hit UB there.
            raise ValueError(
                f"max_rice_param must be {MAX_RICE_PARAM_4BIT} or "
                f"{MAX_RICE_PARAM_5BIT}, got {self.max_rice_param}"
            )
        if self.prediction not in ("fixed", "none", "lpc"):
            raise ValueError(f"unknown prediction mode: {self.prediction}")
        if not (1 <= self.lpc_order <= 32):
            raise ValueError(f"lpc_order out of range: {self.lpc_order}")
        if not (2 <= self.lpc_precision <= 15):
            raise ValueError(f"lpc_precision out of range: {self.lpc_precision}")
