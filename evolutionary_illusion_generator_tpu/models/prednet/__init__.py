"""PredNet predictive-coding ConvLSTM stack (JAX/Pallas)."""

from .model import (
    PredNetParams,
    init_params,
    init_state,
    prednet_step,
    rollout,
    rollout_flow_frames,
)

__all__ = [
    "PredNetParams",
    "init_params",
    "init_state",
    "prednet_step",
    "rollout",
    "rollout_flow_frames",
]
