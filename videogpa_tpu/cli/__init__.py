"""CLI drivers mirroring the reference entry scripts (generate/train/replicate)."""
