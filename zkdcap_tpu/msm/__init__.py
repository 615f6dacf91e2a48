from .pippenger import msm, msm_device
