"""Gaussian diffusion engine (DDPM/DDIM + respacing) for DiT/PixArt sampling.

Capability-parity with the reference's vendored ADM engine
(workloads/DiT/diffusion/: gaussian_diffusion.py:144-875, respace.py,
__init__.py:10-46), re-designed for JAX: coefficient tables are precomputed
numpy arrays gathered per step; the sampling loop is a host-side loop over a
jitted per-step function (each step has a distinct timestep constant, so XLA
compiles one step and reuses it).
"""

from .gaussian import (
    GaussianDiffusion,
    create_diffusion,
    linear_beta_schedule,
    space_timesteps,
)
from .timestep_sampler import (LossSecondMomentResampler,
                               UniformSampler)
from .dpm_solver import DPMSolverMultistep
