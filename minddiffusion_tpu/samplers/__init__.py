from minddiffusion_tpu.samplers import ddim, plms, dpm_solver, ancestral

__all__ = ["ddim", "plms", "dpm_solver", "ancestral"]
