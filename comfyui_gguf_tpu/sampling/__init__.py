from .flow_match import (
    euler_sample_inpaint,
    flux_schedule,
    linear_schedule,
    shift_sigmas,
    euler_sample,
    cfg_wrap,
)

__all__ = ["flux_schedule", "linear_schedule", "shift_sigmas",
           "euler_sample", "euler_sample_inpaint", "cfg_wrap"]
