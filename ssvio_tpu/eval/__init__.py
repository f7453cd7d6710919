"""Trajectory evaluation (evo-compatible APE with SE3 Umeyama alignment)."""
