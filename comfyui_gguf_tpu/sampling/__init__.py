from .flow_match import (
    flux_schedule,
    linear_schedule,
    shift_sigmas,
    euler_sample,
    cfg_wrap,
)

__all__ = ["flux_schedule", "linear_schedule", "shift_sigmas", "euler_sample",
           "cfg_wrap"]
