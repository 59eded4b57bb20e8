"""hm_vae_tpu: a TPU-native (JAX/XLA/Pallas) motion-prior framework.

Re-implements the full capability surface of the hm-vae reference
(task-generic hierarchical human motion prior, 3DV 2021) as an idiomatic
JAX framework: skeleton-aware ops, hierarchical sequence VAE, trajectory
model, latent-optimization applications, data pipeline, SPMD training.
"""

__version__ = "0.3.0"
