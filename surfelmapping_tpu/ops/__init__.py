"""Compute kernels of the surfel mapping pipeline (pure jnp / Pallas)."""
