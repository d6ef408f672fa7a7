"""Model families: VGGT, CogVideoX, Wan, DA3, LPIPS — all functional JAX."""
